// rayn_baseline: CPU baseline for the default rayn workload.
//
// The reference (fu5ha/rayn) is a Rust binary and the Rust toolchain is
// not present in this image (BASELINE.md), so this C++ program
// re-creates the reference's default-scene *workload* — MandelBox
// sphere tracing (12 fold iterations, <=256 marches/ray), 3-bounce GI
// with 4 NEE light samples per vertex (each shadow-marched <=100 steps),
// 2 equi-angular volume samples per vertex (each shadow-marched), sky /
// dielectric / emissive shading — to measure reference-equivalent CPU
// samples/sec on this machine. Multithreaded over pixel rows
// (the analog of the reference's rayon tile pool) and written so the
// compiler can autovectorize the fold loop.
//
// Build: g++ -O3 -march=native -ffast-math -std=c++17 -pthread \
//            rayn_baseline.cpp -o rayn_baseline
// Run:   ./rayn_baseline [width] [height] [spp] [threads]
// Output: one JSON line {"samples_per_sec": N, ...} plus a PPM render.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

struct V3 {
  float x, y, z;
};
static inline V3 v3(float x, float y, float z) { return {x, y, z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline float len(V3 a) { return std::sqrt(dot(a, a)); }
static inline V3 norm(V3 a) { float l = len(a); return a * (1.0f / l); }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// ---------------------------------------------------------------------------
// Scene constants: the reference's default scene parameters.
// ---------------------------------------------------------------------------
static const int   kFractalIters = 12;
static const float kBoxL = 1.0f;
static const float kMinRadSq = 0.01f * 0.01f;
static const float kFixedRadSq = 1.9f * 1.9f;
static const float kScale = -2.1f;
static const float kWorldRadius = 100.0f;
static const float kDetail = 0.5f;
static const int   kMaxMarches = 256;
static const int   kMaxVisMarches = 100;
static const int   kMaxBounces = 3;
static const int   kVolumeMarches = 2;
static const int   kNeeSamples = 4;
static const float kSigmaS = 0.25f;
static const float kSigmaT = 0.035f;

static inline float mandelbox_de(V3 p) {
  V3 off = p;
  float dr = 1.0f;
  for (int i = 0; i < kFractalIters; ++i) {
    p.x = clampf(p.x, -kBoxL, kBoxL) * 2.0f - p.x;
    p.y = clampf(p.y, -kBoxL, kBoxL) * 2.0f - p.y;
    p.z = clampf(p.z, -kBoxL, kBoxL) * 2.0f - p.z;
    float r2 = dot(p, p);
    float m = kFixedRadSq / (r2 > kMinRadSq ? r2 : kMinRadSq);
    if (m < 1.0f) m = 1.0f;
    p = p * m;
    dr *= m;
    p = p * kScale + off;
    dr = -dr * kScale + 1.0f;
  }
  return len(p) / std::fabs(dr);
}

struct Sphere {
  V3 c;
  float r;
  int mat;  // 0 sky, 2 green emissive, 3 blue emissive
};
struct Light {
  V3 p;
  float r;
  V3 e;
};

static std::vector<Sphere> g_spheres;
static std::vector<Light> g_lights;

static inline float sphere_hit(V3 o, V3 d, V3 c, float r, float tmax) {
  V3 oc = o - c;
  float b = dot(oc, d);
  float cc = dot(oc, oc) - r * r;
  float disc = b * b - cc;
  if (disc <= 0.0f) return 1e30f;
  float s = std::sqrt(disc);
  float t1 = -b - s, t2 = -b + s;
  if (t1 > 1e-4f && t1 <= tmax) return t1;
  if (t2 > 1e-4f && t2 <= tmax) return t2;
  return 1e30f;
}

// closest hit: returns t, obj id (-1 miss, n = sdf)
static inline float scene_hit(V3 o, V3 d, float tmax, float hps_lin, int* obj) {
  float best = tmax;
  int id = -1;
  for (size_t k = 0; k < g_spheres.size(); ++k) {
    float t = sphere_hit(o, d, g_spheres[k].c, g_spheres[k].r, best);
    if (t < best) { best = t; id = (int)k; }
  }
  // SDF march
  float t = mandelbox_de(o);
  for (int s = 0; s < kMaxMarches; ++s) {
    V3 p = o + d * t;
    float dist = mandelbox_de(p);
    float thresh = 5e-5f * kDetail;
    float cone = 0.05f * kDetail * hps_lin * t;
    if (cone > thresh) thresh = cone;
    if (std::fabs(dist) < thresh) {
      if (t < best) { best = t; id = (int)g_spheres.size(); }
      break;
    }
    if (t > best) break;
    t += dist;
  }
  *obj = id;
  return best;
}

static inline bool sdf_occluded(V3 a, V3 b) {
  V3 seg = b - a;
  float maxd = len(seg);
  V3 d = seg * (1.0f / maxd);
  float dist = mandelbox_de(a);
  if (std::isnan(dist)) return false;
  float t = dist;
  for (int s = 0; s < kMaxVisMarches; ++s) {
    if (t > maxd) return false;
    V3 p = a + d * t;
    dist = mandelbox_de(p);
    float thresh = 1e-4f * kDetail;
    float lin = 1e-5f * kDetail * t;
    if (lin > thresh) thresh = lin;
    if (std::fabs(dist) < thresh) return true;
    t += dist;
  }
  return false;
}

static inline bool occluded(V3 a, V3 b) {
  V3 seg = b - a;
  float maxd = len(seg);
  V3 d = seg * (1.0f / maxd);
  for (auto& s : g_spheres) {
    V3 oc = a - s.c;
    float bb = dot(oc, d);
    float cc = dot(oc, oc) - s.r * s.r;
    float disc = bb * bb - cc;
    if (disc <= 0.0f) continue;
    float sq = std::sqrt(disc);
    float t1 = -bb - sq, t2 = -bb + sq;
    float tmin = t1 < t2 ? t1 : t2;
    if (tmin > 1e-3f && t1 <= maxd) return true;
  }
  return sdf_occluded(a, b);
}

// PCG hash RNG (same family as the TPU build's counter sampler)
static inline uint32_t pcg(uint32_t x) {
  x = x * 747796405u + 2891336453u;
  x = ((x >> ((x >> 28u) + 4u)) ^ x) * 277803737u;
  return (x >> 22u) ^ x;
}
struct Rng {
  uint32_t s;
  float next() {
    s = pcg(s);
    return (s >> 8) * (1.0f / 16777216.0f);
  }
};

static inline V3 onb_transform(V3 n, V3 v) {
  float ks = n.z >= 0.0f ? 1.0f : -1.0f;
  float ka = 1.0f / (1.0f + std::fabs(n.z));
  float kb = -ks * n.x * n.y * ka;
  V3 uu = v3(1.0f - n.x * n.x * ka, ks * kb, -ks * n.x);
  V3 vv = v3(kb, ks - n.y * n.y * ka * ks, -n.y);
  return uu * v.x + vv * v.y + n * v.z;
}

static inline V3 cosine_hemi(Rng& r) {
  float u1 = r.next(), u2 = r.next();
  float rr = std::sqrt(u1), th = 6.2831853f * u2;
  float x = rr * std::cos(th), y = rr * std::sin(th);
  return v3(x, y, std::sqrt(std::fmax(0.0f, 1.0f - u1)));
}

// material colors (reference setup.rs)
static const V3 kSkyTop = {0.3f, 0.4f, 0.6f};
static const V3 kSkyBot = {0.2f * 0.05f, 0.3f * 0.05f, 0.6f * 0.05f};
static const V3 kAlbedo = {0.2f, 0.2f, 0.2f};
static const float kPower = 1.0f + 0.4f * 0.4f * 0.4f * 0.4f * 300.0f;

static V3 trace(V3 o, V3 d, float hps_lin, Rng& rng) {
  V3 rad = {0, 0, 0}, tp = {1, 1, 1};
  for (int depth = 0; depth <= kMaxBounces; ++depth) {
    int obj;
    float hl = depth == 0 ? hps_lin : 2e-4f * depth;
    float t = scene_hit(o, d, 2.0f * kWorldRadius, hl, &obj);
    if (obj < 0) break;
    V3 p = o + d * t;
    float vol_trans = std::exp(-kSigmaT * t);

    int nsph = (int)g_spheres.size();
    bool is_sdf = obj == nsph;
    int mat = is_sdf ? 1 : g_spheres[obj].mat;
    V3 n;
    float offset_by = 0.0f;
    if (is_sdf) {
      float eps = std::fmax(1e-4f, kDetail * hl * t);
      const float k[4][3] = {{1, -1, -1}, {-1, 1, -1}, {-1, -1, 1}, {1, 1, 1}};
      V3 g = {0, 0, 0};
      for (int i = 0; i < 4; ++i) {
        V3 kk = v3(k[i][0], k[i][1], k[i][2]);
        g = g + kk * mandelbox_de(p + kk * eps);
      }
      n = norm(g);
      offset_by = eps;
    } else {
      n = norm(p - g_spheres[obj].c);
    }

    V3 wo = d * -1.0f;
    // emission
    if (mat == 0) {  // sky: gradient
      float tt = 0.5f * (wo.y + 1.0f);
      V3 le = kSkyTop * (1.0f - tt) + kSkyBot * tt;
      rad = rad + le * tp * vol_trans;
      break;
    }
    if (mat >= 2) {  // emissive
      V3 e = g_lights[0].e;  // green*3 / blue*3 — close enough for timing
      rad = rad + e * (3.0f / 40.0f) * tp * vol_trans;
      break;
    }

    // NEE: kNeeSamples light picks
    for (int i = 0; i < kNeeSamples; ++i) {
      const Light& L = g_lights[(size_t)(rng.next() * g_lights.size()) %
                                g_lights.size()];
      // cone sample
      V3 dl = L.p - p;
      float d2 = dot(dl, dl), dist = std::sqrt(d2);
      V3 w = dl * (1.0f / dist);
      float ctm = std::sqrt(std::fmax(0.0f, 1.0f - L.r * L.r / d2));
      float ct = 1.0f - rng.next() * (1.0f - ctm);
      float st = std::sqrt(std::fmax(0.0f, 1.0f - ct * ct));
      float phi = rng.next() * 6.2831853f;
      V3 lp = L.p + onb_transform(w * -1.0f,
                                  v3(st * std::cos(phi), st * std::sin(phi),
                                     -ct)) * L.r;
      float pdf = 1.0f / (6.2831853f * (1.0f - ctm) + 1e-9f);
      V3 wi = norm(lp - p);
      float ndl = std::fmax(0.0f, dot(n, wi));
      if (ndl <= 0.0f) continue;
      V3 op = p + n * ((dot(n, wi) >= 0 ? 1.0f : -1.0f) * offset_by);
      if (occluded(op, lp)) continue;
      float dl2 = len(lp - p);
      float f_diffuse = 0.31831f;  // 1/pi
      V3 f = kAlbedo * f_diffuse;
      float trans = std::exp(-kSigmaT * dl2);
      float corr = (float)g_lights.size() / kNeeSamples;
      rad = rad + L.e * f * (ndl * trans / pdf) * tp * (corr * vol_trans);
    }

    // volume scattering
    for (int m = 0; m < kVolumeMarches; ++m) {
      for (int i = 0; i < kNeeSamples; ++i) {
        const Light& L = g_lights[(size_t)(rng.next() * g_lights.size()) %
                                  g_lights.size()];
        float delta = dot(L.p - o, d);
        V3 cl = o + d * delta;
        float dd = len(cl - L.p);
        float tha = std::atan2(-delta, dd);
        float thb = std::atan2(t - delta, dd);
        float th = tha + (thb - tha) * rng.next();
        float tt = dd * std::tan(th);
        float sd = delta + tt;
        float vpdf = dd / ((thb - tha) * (dd * dd + tt * tt) + 1e-9f);
        V3 sp = o + d * sd;
        V3 dl = L.p - sp;
        float dist = len(dl);
        float ctm = std::sqrt(
            std::fmax(0.0f, 1.0f - L.r * L.r / (dist * dist)));
        float lpdf = 1.0f / (6.2831853f * (1.0f - ctm) + 1e-9f);
        if (occluded(sp, L.p)) continue;
        float phase = 1.0f / (4.0f * 3.14159265f);
        float trans = std::exp(-kSigmaT * dist);
        float corr = (float)g_lights.size() / kNeeSamples / kVolumeMarches;
        rad = rad + L.e * (phase * trans / (vpdf * lpdf)) * tp *
                    (corr * kSigmaS * std::exp(-kSigmaT * sd));
      }
    }

    // scatter: fresnel-mixed diffuse/phong
    float cosw = std::fabs(dot(n, wo));
    float m5 = 1.0f - cosw;
    float fres = 0.04f + 0.96f * m5 * m5 * m5 * m5 * m5;
    V3 wi, f;
    float pdf;
    if (rng.next() < fres) {
      V3 refl = n * (2.0f * dot(wo, n)) - wo;
      float u1 = rng.next(), u2 = rng.next();
      float a = std::pow(u1, 1.0f / (kPower + 1.0f));
      float b = std::sqrt(std::fmax(0.0f, 1.0f - a * a));
      float ph = 6.2831853f * u2;
      wi = norm(onb_transform(refl, v3(b * std::cos(ph), b * std::sin(ph), a)));
      float cap = std::pow(a, kPower);
      pdf = fres * (kPower + 1.0f) / 6.2831853f * cap;
      float coeff = dot(n, wi) < 0 ? 0.0f : (kPower + 2.0f) / 6.2831853f * cap;
      f = v3(coeff, coeff, coeff);
    } else {
      wi = norm(onb_transform(n, cosine_hemi(rng)));
      pdf = (1.0f - fres) * std::fmax(1e-5f, dot(n, wi) / 3.14159265f);
      f = kAlbedo * 0.31831f;
    }
    float ndl = std::fabs(dot(n, wi));
    tp = tp * f * (vol_trans * ndl / (pdf + 1e-12f));
    if (depth > 2) {
      float mx = std::fmax(tp.x, std::fmax(tp.y, tp.z));
      float rf = std::fmax(1.0f - mx, 0.05f);
      if (rng.next() < rf) break;
      tp = tp * (1.0f / (1.0f - rf));
    }
    o = p + n * ((dot(n, wi) >= 0 ? 1.0f : -1.0f) * offset_by);
    d = wi;
  }
  return rad;
}

int main(int argc, char** argv) {
  int W = argc > 1 ? atoi(argv[1]) : 512;
  int H = argc > 2 ? atoi(argv[2]) : 512;
  int SPP = argc > 3 ? atoi(argv[3]) : 8;
  int NT = argc > 4 ? atoi(argv[4])
                    : (int)std::thread::hardware_concurrency();
  if (NT < 1) NT = 1;

  // scene (reference src/setup.rs:46-170)
  g_spheres.push_back({{0, 0, 0}, kWorldRadius, 0});
  V3 green = norm(v3(1.5f, 4.5f, 3.0f));
  V3 blue = norm(v3(1.5f, 3.0f, 4.5f));
  V3 pairs[2] = {{1.2f, -1.2f, 1.2f}, {-1.2f, 1.2f, 1.2f}};
  for (V3 pp : pairs) {
    V3 gp = v3(pp.x, -pp.y, pp.z);
    g_lights.push_back({gp, 0.15f, green * 40.0f});
    g_lights.push_back({pp, 0.15f, blue * 40.0f});
    g_spheres.push_back({gp, 0.14f, 2});
    g_spheres.push_back({pp, 0.14f, 3});
  }
  g_lights.push_back({{0, 0, 0}, 0.25f, green * 20.0f});
  g_spheres.push_back({{0, 0, 0}, 0.24f, 2});

  // camera (pinhole, 60 deg vfov)
  V3 org = v3(-0.45f, 0.2f, 2.0f) * 2.25f;
  V3 at = {0, 0, 0}, up = {0, 1, 0};
  V3 w = norm(org - at);
  V3 u = norm(cross(up, w));
  V3 v = cross(w, u);
  float half_h = std::tan(0.5235988f);  // tan(30deg)
  float half_w = half_h * (float)W / (float)H;
  float hps_lin = half_h / (float)H;
  V3 ll = org - u * half_w - v * half_h - w;

  std::vector<V3> img((size_t)W * H, {0, 0, 0});
  std::atomic<int> next_row{0};
  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> threads;
  for (int ti = 0; ti < NT; ++ti) {
    threads.emplace_back([&]() {
      for (;;) {
        int y = next_row.fetch_add(1);
        if (y >= H) return;
        for (int x = 0; x < W; ++x) {
          Rng rng{pcg((uint32_t)(x + y * W) * 9781u + 1u)};
          V3 acc = {0, 0, 0};
          for (int s = 0; s < SPP; ++s) {
            float uu = (x + rng.next()) / (float)W;
            float vv = (y + rng.next()) / (float)H;
            V3 dir = norm(ll + u * (2.0f * half_w * uu) +
                          v * (2.0f * half_h * vv) - org);
            acc = acc + trace(org, dir, hps_lin, rng);
          }
          img[(size_t)x + (size_t)y * W] = acc * (1.0f / SPP);
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  double samples = (double)W * H * SPP;

  // PPM output for eyeballing
  FILE* f = fopen("baseline.ppm", "wb");
  if (f) {
    fprintf(f, "P6\n%d %d\n255\n", W, H);
    for (int y = H - 1; y >= 0; --y)
      for (int x = 0; x < W; ++x) {
        V3 c = img[(size_t)x + (size_t)y * W];
        unsigned char px[3] = {
            (unsigned char)(255.0f * clampf(std::pow(c.x, 1 / 2.2f), 0, 1)),
            (unsigned char)(255.0f * clampf(std::pow(c.y, 1 / 2.2f), 0, 1)),
            (unsigned char)(255.0f * clampf(std::pow(c.z, 1 / 2.2f), 0, 1))};
        fwrite(px, 1, 3, f);
      }
    fclose(f);
  }

  printf("{\"samples_per_sec\": %.0f, \"msamples_per_sec\": %.4f, "
         "\"secs\": %.2f, \"threads\": %d, \"wxh_spp\": \"%dx%d@%d\"}\n",
         samples / secs, samples / secs / 1e6, secs, NT, W, H, SPP);
  return 0;
}
