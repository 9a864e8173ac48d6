// Native (C++) GaussVol overlap-tree engine.
//
// The host-side runtime component of the TPU framework: a fast float64
// implementation of the recursive Gaussian overlap tree used for
//   (a) the capacity sizing pre-pass that dimensions the padded TPU tree
//       (the analogue of the reference's CPU GaussVol pre-pass,
//       reference OpenCLAGBNPKernels.cpp:566-655), and
//   (b) a fast golden oracle for validation on large systems where the
//       Python reference implementation is too slow.
//
// This is an independent implementation of the model described in
// models/oracle.py (same math, same tree semantics as the reference
// plugin's gaussvol: 2-Gaussian products, quintic switching, volume-sorted
// children, MAX_ORDER=8, inclusion-exclusion reduction with (psi, F, P)
// gradient back-propagation).
//
// Build: make -C openmm_agbnp_plugin_tpu/runtime
// Used through ctypes (see native.py).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double KFC = 2.2269859253;
constexpr double PI_ = 3.14159265358979323846;
constexpr double VOLMINA = 0.01 * 0.001;
constexpr double VOLMINB = 0.1 * 0.001;
constexpr double MIN_GVOL = FLT_MIN;
constexpr int MAX_ORDER = 8;

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
};

struct Node {
  int level = 0;
  double gv = 0;   // unswitched product volume
  double ga = 0;   // exponent
  Vec3 gc;         // center
  double volume = 0;  // switched volume
  double dvv1 = 0;
  Vec3 dv1;
  double gamma1i = 0;
  double sfp = 1.0;
  int atom = -1;
  int parent = -1;
  int child_start = -1;
  int child_count = -1;
};

double pol_switchfunc(double gvol, double& sp) {
  double swf = 0.0, swfp = 1.0;
  if (gvol > VOLMINB) {
    swf = 1.0;
    swfp = 0.0;
  } else if (gvol < VOLMINA) {
    swf = 0.0;
    swfp = 0.0;
  }
  double swd = 1.0 / (VOLMINB - VOLMINA);
  double swu = (gvol - VOLMINA) * swd;
  double swu2 = swu * swu;
  double swu3 = swu * swu2;
  sp = swfp * swd * 30.0 * swu2 * (1.0 - 2.0 * swu + swu2);
  return swf + swfp * swu3 * (10.0 - 15.0 * swu + 6.0 * swu2);
}

// product of two Gaussians; returns switched volume, fills raw product and
// derivative factors
double ogauss(double v1, double a1, const Vec3& c1, double v2, double a2,
              const Vec3& c2, double& gv, double& ga, Vec3& gc, double& dVdr,
              double& dVdV, double& sfp) {
  Vec3 dist = c2 - c1;
  double d2 = dist.dot(dist);
  double a12 = a1 + a2;
  double deltai = 1.0 / a12;
  double df = a1 * a2 * deltai;
  double ef = std::exp(-df * d2);
  double gvol = (v1 * v2 / std::pow(PI_ / df, 1.5)) * ef;
  dVdr = -2.0 * df * gvol;
  dVdV = v1 > 0 ? gvol / v1 : 0.0;
  gc = (c1 * a1 + c2 * a2) * deltai;
  ga = a12;
  gv = gvol;
  double sp;
  double s = pol_switchfunc(gvol, sp);
  sfp = sp * gvol + s;
  return s * gvol;
}

struct GaussVolCtx {
  int natoms;
  std::vector<int> ishydrogen;
  std::vector<Node> nodes;

  void seed_level1(const double* pos, const double* radii,
                   const double* volumes, const double* gammas) {
    nodes.clear();
    Node root;
    root.level = 0;
    root.child_start = 1;
    root.child_count = natoms;
    root.sfp = 1.0;
    nodes.push_back(root);
    for (int i = 0; i < natoms; ++i) {
      Node nd;
      nd.level = 1;
      nd.gv = ishydrogen[i] ? 0.0 : volumes[i];
      nd.ga = KFC / (radii[i] * radii[i]);
      nd.gc = {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
      nd.volume = nd.gv;
      nd.dvv1 = 1.0;
      nd.gamma1i = gammas[i];
      nd.sfp = 1.0;
      nd.atom = i;
      nd.parent = 0;
      nodes.push_back(nd);
    }
  }

  void grow(int slot) {
    // children of `slot`: overlaps with the last atoms of its later
    // siblings; volume-sorted before insertion, then recurse
    Node root = nodes[slot];
    if (root.parent < 0 || root.level >= MAX_ORDER) return;
    const Node& par = nodes[root.parent];
    int sib_end = par.child_start + par.child_count;
    std::vector<Node> children;
    for (int sj = slot + 1; sj < sib_end; ++sj) {
      int atom2 = nodes[sj].atom;
      const Node& g2 = nodes[atom2 + 1];
      Node nd;
      double dVdr, dVdV, sfp;
      double sv = ogauss(root.gv, root.ga, root.gc, g2.gv, g2.ga, g2.gc,
                         nd.gv, nd.ga, nd.gc, dVdr, dVdV, sfp);
      if (sv > MIN_GVOL) {
        nd.level = root.level + 1;
        nd.volume = sv;
        nd.dv1 = (g2.gc - root.gc) * (-dVdr);
        nd.dvv1 = dVdV;
        nd.sfp = sfp;
        nd.gamma1i = root.gamma1i + g2.gamma1i;
        nd.atom = atom2;
        nd.parent = slot;
        children.push_back(nd);
      }
    }
    if (children.empty()) return;
    std::sort(children.begin(), children.end(),
              [](const Node& a, const Node& b) { return a.volume > b.volume; });
    int start = (int)nodes.size();
    nodes[slot].child_start = start;
    nodes[slot].child_count = (int)children.size();
    for (auto& c : children) nodes.push_back(c);
    for (int c = start; c < start + (int)children.size(); ++c) grow(c);
  }

  void compute_tree(const double* pos, const double* radii,
                    const double* volumes, const double* gammas) {
    seed_level1(pos, radii, volumes, gammas);
    for (int slot = 1; slot <= natoms; ++slot) grow(slot);
  }

  void rescan_volumes(const double* pos, const double* radii,
                      const double* volumes, const double* gammas) {
    // fixed topology, new level-1 data; top-down recompute
    for (int i = 0; i < natoms; ++i) {
      Node& nd = nodes[i + 1];
      nd.gv = ishydrogen[i] ? 0.0 : volumes[i];
      nd.ga = KFC / (radii[i] * radii[i]);
      nd.gc = {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
      nd.volume = nd.gv;
      nd.dvv1 = 1.0;
      nd.dv1 = {0, 0, 0};
      nd.sfp = 1.0;
      nd.gamma1i = gammas[i];
    }
    for (size_t s = (size_t)natoms + 1; s < nodes.size(); ++s) {
      Node& nd = nodes[s];
      const Node& par = nodes[nd.parent];
      const Node& g2 = nodes[nd.atom + 1];
      double dVdr, dVdV, sfp;
      double sv = ogauss(par.gv, par.ga, par.gc, g2.gv, g2.ga, g2.gc, nd.gv,
                         nd.ga, nd.gc, dVdr, dVdV, sfp);
      nd.volume = sv;
      nd.dv1 = (g2.gc - par.gc) * (-dVdr);
      nd.dvv1 = dVdV;
      nd.sfp = sfp;
      nd.gamma1i = par.gamma1i + g2.gamma1i;
    }
  }

  void rescan_gammas(const double* gammas) {
    for (int i = 0; i < natoms; ++i) nodes[i + 1].gamma1i = gammas[i];
    for (size_t s = (size_t)natoms + 1; s < nodes.size(); ++s) {
      Node& nd = nodes[s];
      nd.gamma1i = nodes[nd.parent].gamma1i + nodes[nd.atom + 1].gamma1i;
    }
    // note: nodes are appended depth-first so parents always precede
    // children; a linear sweep is a valid top-down order
  }

  struct Acc {
    double psi = 0, f = 0;
    Vec3 p;
    double psip = 0;
    double e = 0, fe = 0;
    Vec3 pe;
  };

  Acc reduce_node(int slot, double* dr, double* dv, double* free_vol,
                  double* self_vol) {
    const Node& nd = nodes[slot];
    double cf = nd.level % 2 == 0 ? -1.0 : 1.0;
    double vc = nd.level > 0 ? cf : 0.0;
    double vcp = nd.level > 0 ? vc / nd.level : 0.0;

    Acc acc;
    acc.psi = vc * nd.volume;
    acc.f = vc * nd.sfp;
    acc.psip = vcp * nd.volume;
    acc.e = vcp * nd.gamma1i * nd.volume;
    acc.fe = vcp * nd.sfp * nd.gamma1i;

    if (nd.child_start >= 0) {
      for (int c = nd.child_start; c < nd.child_start + nd.child_count; ++c) {
        Acc t = reduce_node(c, dr, dv, free_vol, self_vol);
        acc.psi += t.psi;
        acc.f += t.f;
        acc.p = acc.p + t.p;
        acc.psip += t.psip;
        acc.e += t.e;
        acc.fe += t.fe;
        acc.pe = acc.pe + t.pe;
      }
    }

    if (nd.level > 0) {
      int atom = nd.atom;
      double ai = nodes[atom + 1].ga;
      double a1i = nd.ga;
      double c2 = ai / a1i;
      free_vol[atom] += acc.psi;
      self_vol[atom] += acc.psip;
      Vec3 g = nd.dv1 * (-acc.fe) + acc.pe * c2;
      dr[3 * atom] += g.x;
      dr[3 * atom + 1] += g.y;
      dr[3 * atom + 2] += g.z;
      dv[atom] += nd.gv * acc.fe;
      double c2p = (a1i - ai) / a1i;
      acc.p = nd.dv1 * acc.f + acc.p * c2p;
      acc.pe = nd.dv1 * acc.fe + acc.pe * c2p;
      acc.f = nd.dvv1 * acc.f;
      acc.fe = nd.dvv1 * acc.fe;
    }
    return acc;
  }

  void compute_volume(double* energy, double* volume, double* dr, double* dv,
                      double* free_vol, double* self_vol) {
    std::memset(dr, 0, sizeof(double) * 3 * natoms);
    std::memset(dv, 0, sizeof(double) * natoms);
    std::memset(free_vol, 0, sizeof(double) * natoms);
    std::memset(self_vol, 0, sizeof(double) * natoms);
    Acc acc = reduce_node(0, dr, dv, free_vol, self_vol);
    *energy = acc.e;
    *volume = acc.psi;
  }
};

}  // namespace

extern "C" {

void* gv_create(int natoms, const int* ishydrogen) {
  auto* ctx = new GaussVolCtx();
  ctx->natoms = natoms;
  ctx->ishydrogen.assign(ishydrogen, ishydrogen + natoms);
  return ctx;
}

void gv_destroy(void* h) { delete (GaussVolCtx*)h; }

void gv_compute_tree(void* h, const double* pos, const double* radii,
                     const double* volumes, const double* gammas) {
  ((GaussVolCtx*)h)->compute_tree(pos, radii, volumes, gammas);
}

void gv_rescan_volumes(void* h, const double* pos, const double* radii,
                       const double* volumes, const double* gammas) {
  ((GaussVolCtx*)h)->rescan_volumes(pos, radii, volumes, gammas);
}

void gv_rescan_gammas(void* h, const double* gammas) {
  ((GaussVolCtx*)h)->rescan_gammas(gammas);
}

void gv_compute_volume(void* h, double* energy, double* volume, double* dr,
                       double* dv, double* free_vol, double* self_vol) {
  ((GaussVolCtx*)h)->compute_volume(energy, volume, dr, dv, free_vol,
                                    self_vol);
}

// per-level node counts [MAX_ORDER+1] and max surviving siblings per parent
void gv_level_stats(void* h, int* counts, int* max_siblings) {
  auto* ctx = (GaussVolCtx*)h;
  for (int i = 0; i <= MAX_ORDER; ++i) counts[i] = max_siblings[i] = 0;
  for (const auto& nd : ctx->nodes) {
    if (nd.level <= MAX_ORDER) counts[nd.level]++;
    if (nd.child_count > 0 && nd.level + 1 <= MAX_ORDER)
      max_siblings[nd.level + 1] =
          std::max(max_siblings[nd.level + 1], nd.child_count);
  }
}

int gv_total_nodes(void* h) { return (int)((GaussVolCtx*)h)->nodes.size(); }
}
