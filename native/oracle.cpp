// Native float64 oracle renderer for schwarzschild_tpu.
//
// A fresh C++17 implementation of the reference renderer's per-pixel program
// (assets/shaders/black_hole.frag:843-936 and the structures it consumes),
// in double precision with real control flow.  It is the fast twin of the
// pure-Python oracle (schwarzschild_tpu/oracle/reference.py): identical
// semantics, ~100x faster, used to generate large golden images for the
// parity tests.  Bound to Python via ctypes (oracle/native.py) — no pybind11.
//
// Every function cites the frag lines it implements.  This is NOT a
// translation of the reference C++ app (which holds no rendering code — its
// renderer is GLSL); it is the same mathematical contract re-stated in C++.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

constexpr double PI = 3.14159265358979323846;
constexpr double EPSILON = 1e-7;  // frag:30

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

static inline Vec3 v3(double x, double y, double z) { return {x, y, z}; }
static inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 operator*(Vec3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
static inline Vec3 operator*(double s, Vec3 a) { return a * s; }
static inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double length(Vec3 a) { return std::sqrt(dot(a, a)); }
static inline Vec3 normalize(Vec3 a) { return a * (1.0 / length(a)); }
static inline double square_vector(Vec3 a) { return dot(a, a); }  // frag:357
static inline Vec3 reflect(Vec3 i, Vec3 n) { return i - 2.0 * dot(n, i) * n; }

// Column-major 3x3 frame: columns are (right, up, forward) like GLM.
struct Mat3 {
  Vec3 c0, c1, c2;  // columns
};
static inline Vec3 mul(const Mat3& m, Vec3 v) {
  return m.c0 * v.x + m.c1 * v.y + m.c2 * v.z;
}
static inline Vec3 tmul(const Mat3& m, Vec3 v) {  // transpose(m) * v
  return {dot(m.c0, v), dot(m.c1, v), dot(m.c2, v)};
}
static inline Mat3 load_mat3(const double* p) {
  // Row-major storage (numpy default) of a column-frame matrix: p[r*3+c] is
  // row r, col c; column j = (p[j], p[3+j], p[6+j]).
  Mat3 m;
  m.c0 = {p[0], p[3], p[6]};
  m.c1 = {p[1], p[4], p[7]};
  m.c2 = {p[2], p[5], p[8]};
  return m;
}

// frag:441-454
static inline double min_positive(double n1, double n2) {
  if (n1 > 0 && n2 > 0) return std::min(n1, n2);
  if (n1 > 0) return n1;
  if (n2 > 0) return n2;
  return -1.0;
}

// --- physics (frag:336-355) -------------------------------------------------

static inline double ddu(double u, double r_s) { return -u * (1.0 - 1.5 * r_s * u); }

static inline void rk4_step(double u, double du, double h, double r_s,
                            double* d_u, double* d_du) {
  const double k1 = du;
  const double l1 = ddu(u, r_s);
  const double k2 = du + 0.5 * l1 * h;
  const double l2 = ddu(u + 0.5 * k1 * h, r_s);
  const double k3 = du + 0.5 * l2 * h;
  const double l3 = ddu(u + 0.5 * k2 * h, r_s);
  const double k4 = du + l3 * h;
  const double l4 = ddu(u + k3 * h, r_s);
  *d_u = h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4);
  *d_du = h / 6.0 * (l1 + 2 * l2 + 2 * l3 + l4);
}

// --- scene ABI --------------------------------------------------------------

extern "C" {

// Flat struct-of-pointers scene; all float64, laid out exactly as the numpy
// arrays of OracleScene (oracle/reference.py).
struct CScene {
  // materials
  int32_t n_materials;
  const double* mat_color;        // (M,4)
  const double* mat_ambient;      // (M,)
  const double* mat_diffuse;
  const double* mat_specular;
  const double* mat_shininess;
  const int32_t* mat_texture_index;
  const int32_t* mat_normal_map_index;
  const uint8_t* mat_invert_uv_x;
  const uint8_t* mat_invert_uv_y;
  const uint8_t* mat_swap_uvs;
  const uint8_t* mat_double_sided;
  const uint8_t* mat_flip_normals;
  // lights
  int32_t n_lights;
  const double* light_pos;        // (L,3)
  const double* light_color;      // (L,3)
  const double* light_intensity;  // (L,)
  const double* light_att_const;
  const double* light_att_lin;
  const double* light_att_quad;
  // spheres
  int32_t n_spheres;
  const double* sph_pos;    // (N,3)
  const double* sph_axes;   // (N,3,3)
  const double* sph_radius; // (N,)
  const int32_t* sph_mat;
  // planes
  int32_t n_planes;
  const double* pln_pos;
  const double* pln_axes;
  const double* pln_tex_offset;  // (N,2)
  const double* pln_tex_size;    // (N,2)
  const uint8_t* pln_repeat;
  const int32_t* pln_mat;
  // disks
  int32_t n_disks;
  const double* dsk_pos;
  const double* dsk_axes;
  const double* dsk_radius;
  const int32_t* dsk_mat;
  // hollow disks
  int32_t n_hollow;
  const double* hd_pos;
  const double* hd_axes;
  const double* hd_inner;
  const double* hd_outer;
  const int32_t* hd_mat;
  // cylinders
  int32_t n_cylinders;
  const double* cyl_pos;
  const double* cyl_axes;
  const double* cyl_height;
  const double* cyl_radius;
  const int32_t* cyl_mat;
  // rectangles
  int32_t n_rectangles;
  const double* rct_pos;
  const double* rct_axes;
  const double* rct_width;
  const double* rct_height;
  const int32_t* rct_mat;
  // boxes (6 precomputed face rectangles each)
  int32_t n_boxes;
  const double* box_face_pos;    // (N,6,3)
  const double* box_face_axes;   // (N,6,3,3)
  const double* box_face_width;  // (N,6)
  const double* box_face_height; // (N,6)
  const int32_t* box_mat;
  // textures (padded stack) + background
  int32_t n_tex;
  int32_t tex_h, tex_w;
  const double* tex_data;   // (T,H,W,4), row 0 = bottom
  const double* tex_sizes;  // (T,2) (w,h)
  double tex_max_w, tex_max_h;
  int32_t bg_h, bg_w;
  const double* bg_data;    // (H,W,4)
  double r_s;
};

}  // extern "C"

struct Hit {
  bool is_hit = false;
  double dist = 0;
  Vec3 point;
  Vec3 tangent, bitangent, normal;
  double u = 0, v = 0;  // tangent coordinates
  int obj_type = -42;
  int mat_idx = 0;
  int plane_idx = -1;
};

enum {
  T_TEST_CURVED = -99,
  T_TEST_FLAT = -98,
  T_SPECIAL = -42,
  T_SPHERE = 0,
  T_PLANE = 1,
  T_DISK = 2,
  T_HOLLOW = 3,
  T_CYL = 4,
  T_RECT = 5,
  T_BOX = 6,
};

// --- intersections (frag:457-736) -------------------------------------------

static Hit sphere_intersect(Vec3 o, Vec3 d, Vec3 pos, const Mat3& axes,
                            double radius, double max_lambda) {
  Hit res;
  Vec3 oc = o - pos;
  double D = dot(d, oc) * dot(d, oc) - square_vector(oc) + radius * radius;
  if (D < 0) return res;
  double sq = std::sqrt(D);
  double first = -dot(d, oc);
  double lam = min_positive(first - sq, first + sq);
  if (!(lam >= 0 && (max_lambda < 0 || lam <= max_lambda))) return res;
  res.is_hit = true;
  res.point = o + lam * d;
  res.dist = length(res.point - o);

  Vec3 disp = res.point - pos;
  res.normal = normalize(disp);
  Vec3 local = tmul(axes, disp);
  double phi = std::atan2(local.x, local.z);
  if (phi < 0) phi += 2 * PI;
  double sth = std::clamp(local.y / radius, -1.0, 1.0);
  double theta = std::asin(sth);
  res.u = phi / (2 * PI);
  res.v = theta / PI + 0.5;
  res.tangent = mul(axes, v3(std::cos(phi), 0.0, -std::sin(phi)));
  res.bitangent = mul(axes, v3(std::sin(phi) * std::cos(theta), std::sin(theta),
                               std::cos(phi) * std::cos(theta)));
  res.obj_type = T_SPHERE;
  return res;
}

static Hit plane_intersect(Vec3 o, Vec3 d, Vec3 pos, const Mat3& axes,
                           double max_lambda) {
  Hit res;
  Vec3 nrm = axes.c1;
  double denom = dot(nrm, d);
  if (std::abs(denom) < EPSILON) return res;
  double lam = dot(nrm, pos - o) / denom;
  if (!(lam >= 0 && (max_lambda < 0 || lam <= max_lambda))) return res;
  res.is_hit = true;
  res.point = o + d * lam;
  res.dist = length(res.point - o);
  Vec3 local = tmul(axes, res.point - pos);
  res.u = local.x;
  res.v = 1.0 - local.z;
  res.tangent = axes.c0;
  res.bitangent = v3(-axes.c2.x, -axes.c2.y, -axes.c2.z);
  res.normal = axes.c1;
  res.obj_type = T_PLANE;
  return res;
}

static void radial_frame(Hit& res, Vec3 pos, const Mat3& axes, double* phi_out,
                         double* rlen_out) {
  Vec3 disp = res.point - pos;
  Vec3 local = tmul(axes, disp);
  double phi = std::atan2(local.x, local.z);
  if (phi < 0) phi += 2 * PI;
  res.tangent = normalize(disp);
  res.bitangent = mul(axes, v3(std::cos(phi), 0.0, -std::sin(phi)));
  res.normal = axes.c1;
  *phi_out = phi;
  *rlen_out = length(local);
}

static Hit disk_intersect(Vec3 o, Vec3 d, Vec3 pos, const Mat3& axes,
                          double radius, double max_lambda) {
  Hit res = plane_intersect(o, d, pos, axes, max_lambda);
  if (res.is_hit && square_vector(res.point - pos) <= radius * radius) {
    double phi, rl;
    radial_frame(res, pos, axes, &phi, &rl);
    res.u = rl / radius;
    res.v = phi / (2 * PI);
    res.obj_type = T_DISK;
  } else {
    res.is_hit = false;
  }
  return res;
}

static Hit hollow_disk_intersect(Vec3 o, Vec3 d, Vec3 pos, const Mat3& axes,
                                 double inner, double outer, double max_lambda) {
  Hit res = plane_intersect(o, d, pos, axes, max_lambda);
  if (res.is_hit) {
    double sq = square_vector(res.point - pos);
    if (sq >= inner * inner && sq <= outer * outer) {
      double phi, rl;
      radial_frame(res, pos, axes, &phi, &rl);
      res.u = (rl - inner) / (outer - inner);
      res.v = phi / (2 * PI);
      res.obj_type = T_HOLLOW;
      return res;
    }
  }
  res.is_hit = false;
  return res;
}

static Hit cylinder_intersect(Vec3 o, Vec3 d, Vec3 pos, const Mat3& axes,
                              double height, double radius, double max_lambda) {
  Hit res;
  Vec3 axis = axes.c1;
  Vec3 lo = tmul(axes, o - pos);
  Vec3 ld = tmul(axes, d);
  double a = lo.x * ld.x + lo.z * ld.z;
  double dps = ld.x * ld.x + ld.z * ld.z;
  double D = a * a + dps * (radius * radius - (lo.x * lo.x + lo.z * lo.z));
  if (D < 0 || dps == 0.0) return res;
  double sq = std::sqrt(D);
  double lam1 = -(a + sq) / dps;
  double lam2 = -(a - sq) / dps;
  Vec3 p1 = o + d * lam1;
  Vec3 p2 = o + d * lam2;
  bool in1 = dot(p1 - pos, axis) >= 0 && dot(p1 - pos, axis) <= height;
  bool in2 = dot(p2 - pos, axis) >= 0 && dot(p2 - pos, axis) <= height;
  if (!in1 && !in2) return res;
  double lam = in1 && in2 ? min_positive(lam1, lam2) : (in1 ? lam1 : lam2);
  if (!(lam >= 0 && (max_lambda < 0 || lam <= max_lambda))) return res;
  res.is_hit = true;
  res.point = o + d * lam;
  res.dist = length(res.point - o);
  Vec3 disp = res.point - pos;
  res.normal = normalize(disp);  // reference quirk: includes axial component
  Vec3 local = tmul(axes, disp);
  double phi = std::atan2(local.x, local.z);
  if (phi < 0) phi += 2 * PI;
  res.u = phi / (2 * PI);
  res.v = local.y / height;
  res.tangent = mul(axes, v3(std::cos(phi), 0.0, -std::sin(phi)));
  res.bitangent = axis;
  res.obj_type = T_CYL;
  return res;
}

static Hit rectangle_intersect(Vec3 o, Vec3 d, Vec3 pos, const Mat3& axes,
                               double width, double height, double max_lambda) {
  Hit res = plane_intersect(o, d, pos, axes, max_lambda);
  if (!res.is_hit) return res;
  Vec3 disp = res.point - pos;
  double alpha = dot(disp, axes.c0);
  double beta = dot(disp, axes.c2);
  if (!(alpha >= 0 && alpha <= width && beta >= 0 && beta <= height)) {
    res.is_hit = false;
    return res;
  }
  Vec3 local = tmul(axes, disp);
  res.u = local.x / width;
  res.v = 1.0 - local.z / height;
  res.obj_type = T_RECT;
  return res;
}

// frag:667-692 atlas offsets per face (bot, top, front, back, left, right).
static const double BOX_ATLAS[6][2] = {
    {1, 0}, {1, 2}, {1, 1}, {3, 1}, {0, 1}, {2, 1}};

static Hit box_intersect(Vec3 o, Vec3 d, const double* face_pos,
                         const double* face_axes, const double* face_w,
                         const double* face_h, double max_lambda) {
  Hit res;
  int closest = -1;
  for (int i = 0; i < 6; i++) {
    Vec3 pos = v3(face_pos[i * 3], face_pos[i * 3 + 1], face_pos[i * 3 + 2]);
    Mat3 ax = load_mat3(face_axes + i * 9);
    Hit h = rectangle_intersect(o, d, pos, ax, face_w[i], face_h[i], max_lambda);
    if (!h.is_hit) continue;
    if (closest < 0 || h.dist < res.dist) {
      res = h;
      closest = i;
    }
  }
  if (!res.is_hit) return res;
  res.u = (res.u + BOX_ATLAS[closest][0]) / 4.0;
  res.v = (res.v + BOX_ATLAS[closest][1]) / 3.0;
  res.obj_type = T_BOX;
  return res;
}

// --- closest hit over the scene (frag:755-822) -------------------------------

static Hit scene_intersect(const CScene& s, Vec3 o, Vec3 d, double max_lambda) {
  static const Mat3 I = {v3(1, 0, 0), v3(0, 1, 0), v3(0, 0, 1)};
  Hit closest = sphere_intersect(o, d, v3(0, 0, 0), I, s.r_s, max_lambda);
  closest.obj_type = T_SPECIAL;  // frag:757-758

  auto consider = [&](Hit h, int type, int mat, int plane_idx = -1) {
    if (h.is_hit && (!closest.is_hit || h.dist < closest.dist)) {
      h.obj_type = type;
      h.mat_idx = mat;
      h.plane_idx = plane_idx;
      closest = h;
    }
  };

  for (int i = 0; i < s.n_spheres; i++)
    consider(sphere_intersect(o, d, v3(s.sph_pos[i * 3], s.sph_pos[i * 3 + 1], s.sph_pos[i * 3 + 2]),
                              load_mat3(s.sph_axes + i * 9), s.sph_radius[i], max_lambda),
             T_SPHERE, s.sph_mat[i]);
  for (int i = 0; i < s.n_planes; i++)
    consider(plane_intersect(o, d, v3(s.pln_pos[i * 3], s.pln_pos[i * 3 + 1], s.pln_pos[i * 3 + 2]),
                             load_mat3(s.pln_axes + i * 9), max_lambda),
             T_PLANE, s.pln_mat[i], i);
  for (int i = 0; i < s.n_disks; i++)
    consider(disk_intersect(o, d, v3(s.dsk_pos[i * 3], s.dsk_pos[i * 3 + 1], s.dsk_pos[i * 3 + 2]),
                            load_mat3(s.dsk_axes + i * 9), s.dsk_radius[i], max_lambda),
             T_DISK, s.dsk_mat[i]);
  for (int i = 0; i < s.n_hollow; i++)
    consider(hollow_disk_intersect(o, d, v3(s.hd_pos[i * 3], s.hd_pos[i * 3 + 1], s.hd_pos[i * 3 + 2]),
                                   load_mat3(s.hd_axes + i * 9), s.hd_inner[i], s.hd_outer[i], max_lambda),
             T_HOLLOW, s.hd_mat[i]);
  for (int i = 0; i < s.n_cylinders; i++)
    consider(cylinder_intersect(o, d, v3(s.cyl_pos[i * 3], s.cyl_pos[i * 3 + 1], s.cyl_pos[i * 3 + 2]),
                                load_mat3(s.cyl_axes + i * 9), s.cyl_height[i], s.cyl_radius[i], max_lambda),
             T_CYL, s.cyl_mat[i]);
  for (int i = 0; i < s.n_rectangles; i++)
    consider(rectangle_intersect(o, d, v3(s.rct_pos[i * 3], s.rct_pos[i * 3 + 1], s.rct_pos[i * 3 + 2]),
                                 load_mat3(s.rct_axes + i * 9), s.rct_width[i], s.rct_height[i], max_lambda),
             T_RECT, s.rct_mat[i]);
  for (int i = 0; i < s.n_boxes; i++)
    consider(box_intersect(o, d, s.box_face_pos + i * 18, s.box_face_axes + i * 54,
                           s.box_face_width + i * 6, s.box_face_height + i * 6, max_lambda),
             T_BOX, s.box_mat[i]);
  return closest;
}

// --- texturing / lighting (frag:365-438) ------------------------------------

struct Rgba {
  double r = 0, g = 0, b = 0, a = 0;
};

static Rgba bilinear(const double* data, int h, int w, double u, double v) {
  // GL_LINEAR + GL_REPEAT, texel centers at (i+0.5)/W (textures.py parity).
  double x = u * w - 0.5;
  double y = v * h - 0.5;
  double x0 = std::floor(x), y0 = std::floor(y);
  double fx = x - x0, fy = y - y0;
  auto wrap = [](long i, int n) {
    long m = i % n;
    return (int)(m < 0 ? m + n : m);
  };
  int x0i = wrap((long)x0, w), x1i = wrap((long)x0 + 1, w);
  int y0i = wrap((long)y0, h), y1i = wrap((long)y0 + 1, h);
  const double* c00 = data + (y0i * (long)w + x0i) * 4;
  const double* c10 = data + (y0i * (long)w + x1i) * 4;
  const double* c01 = data + (y1i * (long)w + x0i) * 4;
  const double* c11 = data + (y1i * (long)w + x1i) * 4;
  Rgba out;
  double* po = &out.r;
  for (int c = 0; c < 4; c++) {
    double top = c00[c] + fx * (c10[c] - c00[c]);
    double bot = c01[c] + fx * (c11[c] - c01[c]);
    po[c] = top + fy * (bot - top);
  }
  return out;
}

static Rgba calculate_lighting(const CScene& s, const Hit& hit, Vec3 view_dir) {
  if (hit.obj_type == T_SPECIAL) return {0, 0, 0, 1};
  if (hit.obj_type == T_TEST_CURVED) return {1, 0, 0, 1};
  if (hit.obj_type == T_TEST_FLAT) return {0, 1, 0, 1};

  int i = hit.mat_idx;
  Vec3 normal = hit.normal;
  if (s.mat_flip_normals[i]) normal = v3(-normal.x, -normal.y, -normal.z);
  if (!s.mat_double_sided[i] && dot(normal, view_dir) < 0) return {0, 0, 0, 0};

  double uu = hit.u, vv = hit.v;
  if (s.mat_swap_uvs[i]) std::swap(uu, vv);
  if (s.mat_invert_uv_x[i]) {
    double ext = hit.obj_type == T_PLANE ? s.pln_tex_size[hit.plane_idx * 2] : 1.0;
    uu = ext - uu;
  }
  if (s.mat_invert_uv_y[i]) {
    double ext = hit.obj_type == T_PLANE ? s.pln_tex_size[hit.plane_idx * 2 + 1] : 1.0;
    vv = ext - vv;
  }

  Rgba base = {s.mat_color[i * 4], s.mat_color[i * 4 + 1],
               s.mat_color[i * 4 + 2], s.mat_color[i * 4 + 3]};
  int ti = s.mat_texture_index[i];
  if (ti >= 0 && s.tex_data) {
    double ru = uu * s.tex_sizes[ti * 2] / s.tex_max_w;
    double rv = vv * s.tex_sizes[ti * 2 + 1] / s.tex_max_h;
    bool render_color = true;
    if (hit.obj_type == T_PLANE) {  // frag:387-400
      int j = hit.plane_idx;
      double tsx = s.pln_tex_size[j * 2], tsy = s.pln_tex_size[j * 2 + 1];
      ru -= s.pln_tex_offset[j * 2];
      rv -= s.pln_tex_offset[j * 2 + 1];
      double pu = ru / tsx, pv = rv / tsy;
      ru = ru - tsx * std::floor(ru / tsx);  // GLSL mod
      rv = rv - tsy * std::floor(rv / tsy);
      ru /= tsx;
      rv /= tsy;
      render_color = s.pln_repeat[j] ||
                     (pu >= 0 && pu <= 1 && pv >= 0 && pv <= 1);
    }
    if (render_color)
      base = bilinear(s.tex_data + (long)ti * s.tex_h * s.tex_w * 4,
                      s.tex_h, s.tex_w, ru, rv);
  }

  Vec3 rgb = v3(base.r, base.g, base.b) * s.mat_ambient[i];  // frag:406

  int ni = s.mat_normal_map_index[i];
  if (ni >= 0 && s.tex_data) {  // frag:408-413 (raw rgb, no *2-1)
    double ru = uu * s.tex_sizes[ni * 2] / s.tex_max_w;
    double rv = vv * s.tex_sizes[ni * 2 + 1] / s.tex_max_h;
    Rgba nm = bilinear(s.tex_data + (long)ni * s.tex_h * s.tex_w * 4,
                       s.tex_h, s.tex_w, ru, rv);
    normal = normalize(hit.tangent * nm.r + hit.bitangent * nm.g + normal * nm.b);
  }

  for (int j = 0; j < s.n_lights; j++) {  // frag:415-435
    Vec3 lpos = v3(s.light_pos[j * 3], s.light_pos[j * 3 + 1], s.light_pos[j * 3 + 2]);
    Vec3 to_light = lpos - hit.point;
    double distance = length(to_light);
    Vec3 light_dir = to_light * (1.0 / distance);
    double att = 1.0 / (s.light_att_const[j] + s.light_att_lin[j] * distance +
                        s.light_att_quad[j] * distance * distance);
    double diff = std::max(dot(normal, light_dir), 0.0);
    Vec3 lcol = v3(s.light_color[j * 3], s.light_color[j * 3 + 1], s.light_color[j * 3 + 2]);
    Vec3 diffuse = v3(lcol.x * base.r, lcol.y * base.g, lcol.z * base.b) *
                   (s.mat_diffuse[i] * diff);
    Vec3 rdir = reflect(v3(-light_dir.x, -light_dir.y, -light_dir.z), normal);
    double spec = std::pow(std::max(dot(view_dir, rdir), 0.0), s.mat_shininess[i]);
    Vec3 specular = lcol * (s.mat_specular[i] * spec);
    rgb = rgb + (diffuse + specular) * (att * s.light_intensity[j]);
  }
  return {rgb.x, rgb.y, rgb.z, base.a};
}

static Rgba intersect_color(const CScene& s, Vec3 o, Vec3 d, double max_lambda) {
  Hit hit = scene_intersect(s, o, d, max_lambda);
  if (hit.is_hit) return calculate_lighting(s, hit, v3(-d.x, -d.y, -d.z));
  return {0, 0, 0, 0};
}

static Rgba get_bg(const CScene& s, Vec3 d) {  // frag:829-837
  if (!s.bg_data) return {0, 0, 0, 0};
  double u = std::atan2(d.z, d.x) / PI;
  if (u < 0) u += 2.0;
  u *= 0.5;
  double v = std::asin(std::clamp(d.y, -1.0, 1.0)) / PI + 0.5;
  return bilinear(s.bg_data, s.bg_h, s.bg_w, u, v);
}

// The f32 GLSL hash (frag:839-841) for percent_black parity with the GPU-ish
// behavior; and the portable integer pixel hash (render.pixel_hash_rand).
static float glsl_rand_f32(float x, float y) {
  float sv = std::sin(x * 12.9898f + y * 78.233f);
  float t = sv * 43758.5453f;
  return t - std::floor(t);
}

static float pixel_hash_rand(uint32_t x, uint32_t y, uint32_t width,
                             uint32_t seed) {
  uint32_t h = y * width + x + seed * 0x9E3779B9u;
  h ^= h >> 16;
  h *= 0x7FEB352Du;
  h ^= h >> 15;
  h *= 0x846CA68Bu;
  h ^= h >> 16;
  return (float)(h * 2.3283064365386963e-10);
}

// --- per-pixel main (frag:843-936) ------------------------------------------

struct RenderParams {
  int32_t width, height;
  int32_t max_steps, max_revolutions;
  double u_f;
  double percent_black;
  int32_t raytrace_type;  // 0 curved, 1 flat, 2 half-width, 3 half-height
  double curved_percentage;
  int32_t crosshair;
  int32_t noise_mode;  // 0 glsl, 1 hash
  uint32_t noise_seed;
};

static void add(Rgba& a, const Rgba& b) {
  a.r += b.r;
  a.g += b.g;
  a.b += b.b;
  a.a += b.a;
}

static Rgba trace_ray(const CScene& s, const RenderParams& p, Vec3 origin,
                      Vec3 direction) {  // frag:883-935
  Rgba color = {0, 0, 0, 0};
  const double max_angle = 2.0 * p.max_revolutions * PI;
  static const Mat3 I = {v3(1, 0, 0), v3(0, 1, 0), v3(0, 0, 1)};

  Vec3 n = normalize(origin);
  Vec3 t = normalize(cross(cross(n, direction), n));
  Vec3 pos = origin;
  Vec3 d = direction;
  double u = 1.0 / length(origin);
  double du = -u * dot(d, n) / dot(d, t);

  double phi = 0.0;
  for (int i = 0; i < p.max_steps; i++) {
    if (u < p.u_f) {  // frag:891-912
      Hit big = sphere_intersect(pos, d, v3(0, 0, 0), I, 1.0 / p.u_f, -1.0);
      bool flat = !big.is_hit;
      if (!flat) {
        n = normalize(big.point);
        flat = std::abs(dot(d, n)) >= 1.0 - EPSILON;
      }
      if (flat) {
        Rgba c = intersect_color(s, pos, d, -1.0);
        add(color, c);
        if (c.a != 1.0) add(color, get_bg(s, d));
        return color;
      }
      t = normalize(cross(cross(n, d), n));
      u = 1.0 / length(big.point);
      du = -u * dot(d, n) / dot(d, t);
    }

    double h = (max_angle - phi) / (double)(p.max_steps - i);
    phi += h;
    double d_u, d_du;
    rk4_step(u, du, h, s.r_s, &d_u, &d_du);
    u += d_u;
    du += d_du;
    if (u < 0) break;

    Vec3 prev = pos;
    pos = (std::cos(phi) * n + std::sin(phi) * t) * (1.0 / u);
    Vec3 delta = pos - prev;
    double seg = length(delta);
    d = delta * (1.0 / seg);

    Rgba c = intersect_color(s, prev, d, seg);
    add(color, c);
    if (c.a == 1.0) return color;
  }
  add(color, get_bg(s, d));
  return color;
}

extern "C" {

// Render rows [row0, row1) of the image into out (row-major RGBA f64,
// row 0 = top).  Threroughly mirrors oracle/reference.py::render_pixel.
void oracle_render_rows(const CScene* scene, const RenderParams* params,
                        const double* cam_pos, const double* cam_axes,
                        double fov, int32_t row0, int32_t row1, double* out) {
  const CScene& s = *scene;
  const RenderParams& p = *params;
  Vec3 cp = v3(cam_pos[0], cam_pos[1], cam_pos[2]);
  Mat3 ca = load_mat3(cam_axes);
  const double ray_forward = 1.0 / std::tan(fov / 360.0 * PI);

  for (int32_t row = row0; row < row1; row++) {
    double v_ndc = 1.0 - (2.0 * row + 1.0) / p.height;
    for (int32_t col = 0; col < p.width; col++) {
      double u_ndc = (2.0 * col + 1.0) / p.width - 1.0;
      Rgba color = {0, 0, 0, 0};

      if (p.crosshair) {  // frag:845-857
        double px = std::abs(u_ndc * p.width / 2.0);
        double py = std::abs(v_ndc * p.height / 2.0);
        bool on = (px < 1.0 && py > 5.0 && py < 15.0) ||
                  (py < 1.0 && px > 5.0 && px < 15.0);
        if (on) color = {0.5, 0.5, 0.5, 0.5};
      }

      Vec3 uvv = v3(u_ndc, v_ndc * (double)p.height / p.width, ray_forward);
      Vec3 dir = normalize(mul(ca, uvv));
      Vec3 nvec = normalize(cp);

      bool flat = p.raytrace_type == 1 ||
                  (p.raytrace_type == 2 && u_ndc > 2.0 * p.curved_percentage - 1.0) ||
                  (p.raytrace_type == 3 && v_ndc > 2.0 * p.curved_percentage - 1.0) ||
                  std::abs(dot(dir, nvec)) >= 1.0 - EPSILON;
      if (flat) {
        Rgba c = intersect_color(s, cp, dir, -1.0);
        add(color, c);
        if (c.a != 1.0) add(color, get_bg(s, dir));
      } else {
        bool skip = false;
        if (p.percent_black >= 0.0) {
          float rnd = p.noise_mode == 0
                          ? glsl_rand_f32((float)u_ndc,
                                          (float)(v_ndc * (double)p.height / p.width))
                          : pixel_hash_rand(col, row, p.width, p.noise_seed);
          skip = rnd <= (float)p.percent_black;
        }
        if (!skip) {
          Rgba c = trace_ray(s, p, cp, dir);
          add(color, c);
        }
      }

      double* px = out + ((long)(row - row0) * p.width + col) * 4;
      px[0] = color.r;
      px[1] = color.g;
      px[2] = color.b;
      px[3] = color.a;
    }
  }
}

}  // extern "C"
