"""Scalar NumPy oracle implementations (SURVEY.md §4: CPU oracle).

Independent, deliberately-slow ports of the *semantics* (not the code) of
the reference's hot math, used as golden references for the vectorized
JAX implementations.
"""

import numpy as np


def mandelbox_dist(p, iterations=12, box_l=1.0, min_rad=0.01,
                   fixed_rad=1.9, scale=-2.1):
    """Scalar MandelBox distance estimator (semantics of reference
    src/sdf.rs:126-141)."""
    p = np.asarray(p, np.float64)
    offset = p.copy()
    dr = 1.0
    min_rad_sq = min_rad * min_rad
    fixed_rad_sq = fixed_rad * fixed_rad
    for _ in range(iterations):
        # box fold
        p = np.clip(p, -box_l, box_l) * 2.0 - p
        # sphere fold
        r2 = float(np.dot(p, p))
        mul = max(1.0, fixed_rad_sq / max(min_rad_sq, r2))
        p = p * mul
        dr = dr * mul
        p = p * scale + offset
        dr = -dr * scale + 1.0
    return float(np.linalg.norm(p) / abs(dr))


def sphere_hit(origin, direction, center, radius, t_max):
    """Scalar sphere intersection (semantics of reference
    src/sphere.rs:48-72). Returns t or None."""
    oc = np.asarray(origin, np.float64) - np.asarray(center, np.float64)
    d = np.asarray(direction, np.float64)
    b = float(np.dot(oc, d))
    c = float(np.dot(oc, oc)) - radius * radius
    descrim = b * b - c
    if descrim <= 0.0:
        return None
    sq = np.sqrt(descrim)
    t1, t2 = -b - sq, -b + sq
    t1_valid = 1e-4 < t1 <= t_max
    t2_valid = 1e-4 < t2 <= t_max
    if not (t1_valid or t2_valid):
        return None
    return t1 if t1_valid else t2


def sphere_march(dist_fn, origin, direction, t_max, eps_const, eps_abs,
                 eps_lin, max_steps):
    """Scalar sphere trace (semantics of reference src/sdf.rs:59-83)."""
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    t = dist_fn(o)
    if np.isnan(t):
        return t
    for _ in range(max_steps):
        dist = dist_fn(o + t * d)
        thresh = max(eps_const, eps_abs + eps_lin * t)
        if abs(dist) < thresh or t > t_max:
            break
        t = t + dist
    return t


def cone_light_sample(u1, u2, light_pos, light_rad, p):
    """Scalar visible-cap sphere-light sample (semantics of reference
    src/light.rs:38-72). Returns (point, pdf)."""
    light_pos = np.asarray(light_pos, np.float64)
    p = np.asarray(p, np.float64)
    dir_to_light = light_pos - p
    dist_sq = float(np.dot(dir_to_light, dir_to_light))
    dist = np.sqrt(dist_sq)
    w = dir_to_light / dist
    # orthonormal basis around -w (Pixar method, reference src/math.rs:49-59)
    nor = -w
    ks = 1.0 if nor[2] >= 0 else -1.0
    ka = 1.0 / (1.0 + abs(nor[2]))
    kb = -ks * nor[0] * nor[1] * ka
    uu = np.array([1.0 - nor[0] * nor[0] * ka, ks * kb, -ks * nor[0]])
    vv = np.array([kb, ks - nor[1] * nor[1] * ka * ks, -nor[1]])

    r2 = light_rad * light_rad
    sin_theta_max_2 = r2 / dist_sq
    cos_theta_max = np.sqrt(max(0.0, 1.0 - sin_theta_max_2))
    cos_theta = (1.0 - u1) + u1 * cos_theta_max
    sin_theta = np.sqrt(max(0.0, 1.0 - cos_theta * cos_theta))
    phi = u2 * 2.0 * np.pi
    ds = dist * cos_theta - np.sqrt(max(0.0, r2 - dist_sq * sin_theta * sin_theta))
    cos_alpha = (dist_sq + r2 - ds * ds) / (2.0 * dist * light_rad)
    sin_alpha = np.sqrt(max(0.0, 1.0 - cos_alpha * cos_alpha))
    offset = (uu * sin_alpha * np.cos(phi) + vv * sin_alpha * np.sin(phi)
              + nor * cos_alpha)
    point = light_pos + offset * light_rad
    pdf = 1.0 / (2.0 * np.pi * (1.0 - cos_theta_max))
    return point, pdf


def equi_angular_sample(u, light_pos, ray_o, ray_d, max_distance):
    """Scalar equi-angular volume sample (semantics of reference
    src/light.rs:75-102, Kulla & Fajardo). Returns (distance, pdf)."""
    light_pos = np.asarray(light_pos, np.float64)
    ray_o = np.asarray(ray_o, np.float64)
    ray_d = np.asarray(ray_d, np.float64)
    delta = float(np.dot(light_pos - ray_o, ray_d))
    closest = ray_o + delta * ray_d
    dl = float(np.linalg.norm(closest - light_pos))
    theta_a = np.arctan2(-delta, dl)
    theta_b = np.arctan2(max_distance - delta, dl)
    th = theta_a + (theta_b - theta_a) * u
    t = dl * np.tan(th)
    sample_dist = delta + t
    pdf = dl / ((theta_b - theta_a) * (dl * dl + t * t))
    return sample_dist, pdf


def sphere_march_occluded(dist_fn, start, end, detail_scale, max_steps):
    """Scalar shadow march (semantics of reference src/sdf.rs:25-57 /
    rayn_tpu.ops.march.march_occlusion)."""
    start = np.asarray(start, np.float64)
    end = np.asarray(end, np.float64)
    seg = end - start
    max_dist = float(np.linalg.norm(seg))
    d = seg / max_dist
    dist = dist_fn(start)
    if np.isnan(dist):
        return False
    hit = dist < 1e-4
    t = dist
    eps_c = 1e-4 * detail_scale
    eps_l = 1e-5 * detail_scale
    for _ in range(max_steps):
        if t > max_dist:
            return False
        dist = dist_fn(start + t * d)
        hit = abs(dist) < max(eps_c, eps_l * t)
        if hit:
            return t <= max_dist
        t = t + dist
    return bool(hit) and t <= max_dist


def tetrahedral_normal(dist_fn, p, eps):
    """Scalar 4-tap tetrahedral normal (rayn_tpu.ops.sdf)."""
    ks = [np.array(k, np.float64) for k in
          ((1, -1, -1), (-1, 1, -1), (-1, -1, 1), (1, 1, 1))]
    n = np.zeros(3)
    for k in ks:
        n = n + k * dist_fn(np.asarray(p) + k * eps)
    return n / np.linalg.norm(n)
