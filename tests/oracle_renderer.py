"""Scalar CPU oracle renderer (SURVEY.md §4 "CPU oracle").

An independent, loop-per-ray numpy implementation of the full integrator
semantics (ray generation -> bounces -> NEE -> volume -> scatter -> film),
fed the *same* sampler streams as the production wavefront renderer, so
the two must agree to float32 tolerance. The production code path is
vectorized masked wavefronts; this one is plain per-sample Python — they
share no implementation.

Supports sphere scenes and (at tiny resolutions) the full MandelBox SDF
path — primary marches, shadow marches, tetrahedral normals, SDF origin
offsets — so the fractal pipeline is RMSE-gated end to end as well.
"""

import numpy as np

import oracle

PI = np.pi


class OracleSampler:
    """Precomputes every sampler stream via rayn_tpu.utils.rng (streams
    are infrastructure shared with production; the physics below is not)."""

    def __init__(self, settings, frame, n_pixels):
        import jax.numpy as jnp
        from rayn_tpu.utils import rng as rng_mod
        tables = rng_mod.build_sample_tables(settings, frame)
        pixels = jnp.arange(n_pixels, dtype=jnp.int32)[:, None]
        pixels = jnp.broadcast_to(pixels, (n_pixels, settings.spp))
        sidx = jnp.broadcast_to(
            jnp.arange(settings.spp, dtype=jnp.int32)[None, :],
            (n_pixels, settings.spp))
        self.t1d = np.stack([
            np.asarray(rng_mod.sample_1d(settings, tables, s, sidx, pixels))
            for s in range(settings.num_1d_sets)])
        self.t2d = np.stack([
            np.asarray(rng_mod.sample_2d(settings, tables, s, sidx, pixels))
            for s in range(settings.num_2d_sets)])

    def u1(self, set_id, pixel, sample):
        return float(self.t1d[set_id, pixel, sample])

    def u2(self, set_id, pixel, sample):
        return self.t2d[set_id, pixel, sample].astype(np.float64)


def onb(n):
    ks = 1.0 if n[2] >= 0.0 else -1.0
    ka = 1.0 / (1.0 + abs(n[2]))
    kb = -ks * n[0] * n[1] * ka
    uu = np.array([1.0 - n[0] * n[0] * ka, ks * kb, -ks * n[0]])
    vv = np.array([kb, ks - n[1] * n[1] * ka * ks, -n[1]])
    return uu, vv


def concentric_disk(u, v):
    a, b = 2 * u - 1, 2 * v - 1
    if a == 0 and b == 0:
        b = 1e-4
    if a * a > b * b:
        r, phi = a, (PI / 4) * b / a
    else:
        r, phi = b, PI / 2 - (PI / 4) * a / b
    return r * np.cos(phi), r * np.sin(phi)


def cosine_hemisphere(u, v):
    x, y = concentric_disk(u, v)
    z = np.sqrt(1.0 - min(x * x + y * y, 1.0))
    return np.array([x, y, z])


def cosine_power(u, v, power):
    a = u ** (1.0 / (power + 1.0))
    b = np.sqrt(max(0.0, 1.0 - a * a))
    phi = 2 * PI * v
    return np.array([b * np.cos(phi), b * np.sin(phi), a])


def schlick(c, f0=0.04):
    return f0 + (1 - f0) * (1 - c) ** 5


def _channel_at(knots, t0, t1, t):
    """[K] objects' [T]-knot uniform channel lerped at scalar time t."""
    T = knots.shape[1]
    if T == 1:
        return knots[:, 0, :]
    u = (t - t0) / (t1 - t0) * (T - 1)
    u = min(max(u, 0.0), float(T - 1))
    i0 = min(int(np.floor(u)), T - 2)
    frac = u - i0
    return knots[:, i0, :] * (1.0 - frac) + knots[:, i0 + 1, :] * frac


class OracleScene:
    """Mirror of SceneData/SceneStatic: spheres, lights, materials, and
    (optionally) the MandelBox SDF — all marched scalar-style."""

    def __init__(self, data, static, settings=None, sdf_iters=12,
                 extra_oracle_sdfs=None, albedo_fns=None):
        # per-shading-point albedo overrides (scalar twin of
        # SceneStatic.mat_param_fns): {mat id: fn(p, n) -> rgb}
        self.albedo_fns = dict(albedo_fns or {})
        # full knot grids so animated channels can be lerped at each
        # ray's time (set_time); knot 0 doubles as the static value
        self.center_knots = np.asarray(data.sphere_centers.values,
                                       np.float64)
        self.centers = self.center_knots[:, 0, :]
        self.sph_t = (float(data.sphere_centers.t0),
                      float(data.sphere_centers.t1))
        self.radii = np.asarray(data.sphere_radii)
        self.mats = np.asarray(data.sphere_mats)
        self.kind = np.asarray(data.materials.kind)
        self.color_a = np.asarray(data.materials.color_a, np.float64)
        self.color_b = np.asarray(data.materials.color_b, np.float64)
        self.power = np.asarray(data.materials.power, np.float64)
        self.ior = np.asarray(data.materials.ior, np.float64)
        self.light_knots = np.asarray(data.light_pos.values, np.float64)
        self.lights_p = self.light_knots[:, 0, :]
        self.light_t = (float(data.light_pos.t0),
                        float(data.light_pos.t1))
        self.animated = (self.center_knots.shape[1] > 1
                         or self.light_knots.shape[1] > 1)
        self.lights_r = np.asarray(data.light_radii)
        self.lights_e = np.asarray(data.light_emission, np.float64)
        self.sigma_s = float(data.volume_sigma_s) if static.has_scattering else None
        self.sigma_t = float(data.volume_sigma_t) if static.has_extinction else None
        self.has_sdf = static.has_sdf
        # independent scalar (dist_fn, material) per SDF instance; the
        # primary is assumed to be the MandelBox (derived from its
        # params), further instances must be supplied by the test via
        # extra_oracle_sdfs — the oracle cannot (and must not) evaluate
        # the repo's own jax programs.
        self.sdf_instances = []
        n_inst = (1 + len(static.extra_sdfs)) if static.has_sdf else 0
        if static.has_sdf and extra_oracle_sdfs is not None \
                and len(extra_oracle_sdfs) == n_inst:
            # full override: one (dist_fn, mat) per instance
            self.sdf_instances = list(extra_oracle_sdfs)
            self.dist_fn, self.sdf_mat = self.sdf_instances[0]
        elif static.has_sdf:
            prm = data.sdf_params
            import numpy as _np
            scale = float(prm.scale)
            box_l = float(prm.box_l)
            min_rad = float(_np.sqrt(float(prm.min_rad_sq)))
            fixed_rad = float(_np.sqrt(float(prm.fixed_rad_sq)))
            self.sdf_iters = sdf_iters
            self.sdf_mat = static.sdf_mat
            self.dist_fn = lambda p: oracle.mandelbox_dist(
                p, iterations=self.sdf_iters, box_l=box_l,
                min_rad=min_rad, fixed_rad=fixed_rad, scale=scale)
            self.sdf_instances.append((self.dist_fn, static.sdf_mat))
            if extra_oracle_sdfs:
                assert len(extra_oracle_sdfs) == len(static.extra_sdfs)
                self.sdf_instances.extend(extra_oracle_sdfs)
            else:
                assert not static.extra_sdfs, \
                    "multi-SDF scene needs extra_oracle_sdfs"
        self.detail = settings.sdf_detail_scale if settings else 0.5
        self.max_marches = settings.max_marches if settings else 256
        self.max_vis = settings.max_vis_marches if settings else 100

    def set_time(self, t):
        """Lerp animated sphere-center / light-position channels at the
        ray's time; mirrors scene.sphere_centers_at / light_position_of
        (uniform-grid clip, floor, clamp, lerp — scene/animation.py
        AnimChannel.sample)."""
        self.centers = _channel_at(self.center_knots, *self.sph_t, t)
        self.lights_p = _channel_at(self.light_knots, *self.light_t, t)

    def sdf_obj_id(self):
        return len(self.radii)

    def albedo(self, mat, p, n):
        """color_a at a shading point — constant from the material
        table, or the per-point override (mat_param_fns twin)."""
        fn = self.albedo_fns.get(int(mat))
        if fn is not None:
            return np.asarray(fn(p, n), np.float64)
        return self.color_a[mat]

    def closest_hit(self, o, d, t_max, hps_abs=0.0, hps_lin=0.0):
        best, idx = t_max, -1
        for k in range(len(self.radii)):
            t = oracle.sphere_hit(o, d, self.centers[k], self.radii[k], best)
            if t is not None and t < best:
                best, idx = t, k
        for i, (dist_fn, _mat) in enumerate(self.sdf_instances):
            t = oracle.sphere_march(
                dist_fn, o, d, best, 5e-5 * self.detail,
                0.05 * self.detail * hps_abs, 0.05 * self.detail * hps_lin,
                self.max_marches)
            if not np.isnan(t) and t < best:
                best, idx = t, self.sdf_obj_id() + i
        return best, idx

    def occluded(self, a, b):
        seg = b - a
        dist = np.linalg.norm(seg)
        d = seg / dist
        for k in range(len(self.radii)):
            oc = a - self.centers[k]
            bq = float(np.dot(oc, d))
            cq = float(np.dot(oc, oc)) - self.radii[k] ** 2
            disc = bq * bq - cq
            if disc <= 0:
                continue
            sq = np.sqrt(disc)
            t1, t2 = -bq - sq, -bq + sq
            if min(t1, t2) > 1e-3 and t1 <= dist:
                return True
        for dist_fn, _mat in self.sdf_instances:
            if oracle.sphere_march_occluded(
                    dist_fn, a, b, self.detail, self.max_vis):
                return True
        return False


def render_oracle(data, static, settings, camera, frame, time_range,
                  fis_table, sdf_iters=12, extra_oracle_sdfs=None,
                  albedo_fns=None):
    """Returns dict of [H, W(,3)] mean images matching film.resolve."""
    from rayn_tpu.utils import rng as rng_mod

    w, h = settings.resolution
    scene = OracleScene(data, static, settings, sdf_iters,
                        extra_oracle_sdfs=extra_oracle_sdfs,
                        albedo_fns=albedo_fns)
    sampler = OracleSampler(settings, frame, w * h)

    # pinhole camera parameters; animated channels are lerped at each
    # ray's shutter time (mirrors PinholeCamera.generate + _look_basis)
    cam_chans = tuple(
        (np.asarray(ch.values, np.float64), float(ch.t0), float(ch.t1))
        for ch in (camera.origin, camera.at, camera.up))
    cam_animated = any(k.shape[0] > 1 for k, _, _ in cam_chans)
    half_w = float(camera.half_w)
    half_h = float(camera.half_h)

    def camera_at(t):
        org, at, up = (_channel_at(k[None], t0, t1, t)[0]
                       for (k, t0, t1) in cam_chans)
        ww = (org - at) / np.linalg.norm(org - at)
        uu = np.cross(up, ww)
        uu /= np.linalg.norm(uu)
        vv = np.cross(ww, uu)
        return org, uu, vv, org - uu * half_w - vv * half_h - ww

    org0, uu, vv, lower_left = camera_at(time_range[0])
    hps_lin = float(camera.hps)

    fis = np.asarray(fis_table, np.float64)

    def fis_sample(u):
        n = len(fis)
        u2 = 2.0 * (u - 0.5)
        mult = -1.0 if u2 < 0 else 1.0
        ua = min(max(abs(u2), 0.0), 0.99999)
        idxf = ua * (n - 1)
        i = int(np.floor(idxf))
        t = idxf - i
        return mult * (fis[i] * (1 - t) + fis[i + 1] * t)

    color = np.zeros((h, w, 3))
    alpha = np.zeros((h, w))
    background = np.zeros((h, w, 3))
    normal_img = np.zeros((h, w, 3))

    s = settings
    for py in range(h):
        for px in range(w):
            pix = px + py * w
            for samp in range(s.spp):
                if scene.animated or cam_animated:
                    # shutter-time jitter (mirrors renderer.generate_rays;
                    # the stream is counter-based, so sampling it here
                    # shifts no other set)
                    ut = sampler.u1(rng_mod.set1d_time(), pix, samp)
                    ray_time = (time_range[0]
                                + (time_range[1] - time_range[0]) * ut)
                    scene.set_time(ray_time)
                    if cam_animated:
                        org0, uu, vv, lower_left = camera_at(ray_time)
                upx = sampler.u2(rng_mod.set2d_pixel_uv(), pix, samp)
                ox = fis_sample(upx[0])
                oy = fis_sample(upx[1])
                ndc = np.array([(px + 0.5 + ox) / w, (py + 0.5 + oy) / h])
                d = (lower_left + uu * (2 * half_w) * ndc[0]
                     + vv * (2 * half_h) * ndc[1] - org0)
                d = d / np.linalg.norm(d)
                o = org0.copy()

                radiance = np.zeros(3)
                tp = np.ones(3)
                for depth in range(s.max_bounces + 1):
                    hl = hps_lin if depth == 0 else 2e-4 * depth
                    t, obj = scene.closest_hit(o, d, 2.0 * s.world_radius,
                                               0.0, hl)
                    if obj < 0:
                        break
                    p = o + t * d
                    if scene.has_sdf and obj >= scene.sdf_obj_id():
                        inst_fn, inst_mat = scene.sdf_instances[
                            obj - scene.sdf_obj_id()]
                        hl = hps_lin if depth == 0 else 2e-4 * depth
                        eps = max(1e-4, scene.detail * hl * t)
                        n = oracle.tetrahedral_normal(inst_fn, p, eps)
                        offset_by = eps
                        mat = inst_mat
                    else:
                        n = (p - scene.centers[obj])
                        n /= np.linalg.norm(n)
                        offset_by = 0.0
                        mat = scene.mats[obj]
                    kind = scene.kind[mat]
                    c_a = scene.albedo(mat, p, n)
                    wo = -d
                    vol_trans = (np.exp(-scene.sigma_t * t)
                                 if scene.sigma_t is not None else 1.0)

                    # emission
                    if kind == 2:  # sky
                        tt = 0.5 * (wo[1] + 1.0)
                        le = (c_a * (1 - tt)
                              + scene.color_b[mat] * tt)
                        radiance += le * tp * vol_trans
                    elif kind == 3:  # emissive
                        radiance += scene.color_b[mat] * tp * vol_trans
                    # lambert, dielectric, metallic, refractive scatter on
                    receives = kind in (0, 1, 4, 5)

                    # NEE
                    if len(scene.lights_r) and receives:
                        corr = len(scene.lights_r) / s.nee_light_samples
                        for i in range(s.nee_light_samples):
                            up = sampler.u1(
                                rng_mod.set1d_light_pick(s, depth, i), pix,
                                samp)
                            li_idx = min(int(up * len(scene.lights_r)),
                                         len(scene.lights_r) - 1)
                            u2v = sampler.u2(
                                rng_mod.set2d_nee(s, depth, i), pix, samp)
                            lp_pt, pdf = oracle.cone_light_sample(
                                u2v[0], u2v[1], scene.lights_p[li_idx],
                                scene.lights_r[li_idx], p)
                            wi_full = lp_pt - p
                            dist = np.linalg.norm(wi_full)
                            wi = wi_full / dist
                            ndl = max(0.0, float(np.dot(n, wi)))
                            occ_o = p + n * (np.sign(np.dot(n, wi))
                                             * offset_by)
                            if scene.occluded(occ_o, lp_pt):
                                continue
                            # bsdf f
                            if kind == 0:
                                f = c_a / PI
                            elif kind == 5:
                                continue  # refractive: no NEE (f = 0)
                            else:
                                fr = schlick(ndl)
                                half = wo + wi
                                half /= np.linalg.norm(half)
                                ca = max(0.0, float(np.dot(half, n))) ** \
                                    scene.power[mat]
                                spec = ca * (scene.power[mat] + 2) / (2 * PI)
                                if kind == 4:  # metallic: colored Fresnel
                                    a_c = c_a
                                    fres_c = a_c + (1 - a_c) * (1 - ndl) ** 5
                                    f = fres_c * spec
                                else:
                                    f = (spec * fr
                                         + c_a / PI * (1 - fr))
                            seg_tr = (np.exp(-scene.sigma_t * dist)
                                      if scene.sigma_t is not None else 1.0)
                            radiance += (scene.lights_e[li_idx] * f * ndl
                                         * seg_tr / pdf * tp * corr
                                         * vol_trans)

                    # volume
                    if scene.sigma_s is not None and len(scene.lights_r):
                        vc = (len(scene.lights_r) / s.nee_light_samples
                              / s.volume_marches)
                        for m in range(s.volume_marches):
                            ud = sampler.u1(
                                rng_mod.set1d_vol_dist(s, depth, m), pix,
                                samp)
                            for i in range(s.nee_light_samples):
                                up = sampler.u1(
                                    rng_mod.set1d_vol_pick(s, depth, m, i),
                                    pix, samp)
                                li_idx = min(int(up * len(scene.lights_r)),
                                             len(scene.lights_r) - 1)
                                vd, vpdf = oracle.equi_angular_sample(
                                    ud, scene.lights_p[li_idx], o, d, t)
                                sp = o + vd * d
                                u2v = sampler.u2(
                                    rng_mod.set2d_vol(s, depth, m, i), pix,
                                    samp)
                                lp_pt, lpdf = oracle.cone_light_sample(
                                    u2v[0], u2v[1], scene.lights_p[li_idx],
                                    scene.lights_r[li_idx], sp)
                                dpl = np.linalg.norm(lp_pt - sp)
                                if scene.occluded(sp, lp_pt):
                                    continue
                                seg_tr = (np.exp(-scene.sigma_t * dpl)
                                          if scene.sigma_t is not None
                                          else 1.0)
                                tp_tr = (np.exp(-scene.sigma_t * vd)
                                         if scene.sigma_t is not None
                                         else 1.0)
                                radiance += (scene.lights_e[li_idx]
                                             * (1 / (4 * PI)) * seg_tr
                                             / (vpdf * lpdf) * vc
                                             * scene.sigma_s * tp_tr * tp)

                    if depth == 0 and receives:
                        alpha[py, px] += 1.0
                        normal_img[py, px] += n

                    if not receives:
                        if depth == 0:
                            background[py, px] += radiance
                        else:
                            color[py, px] += radiance
                        break

                    # scatter
                    uf = sampler.u1(rng_mod.set1d_fresnel(s, depth), pix, samp)
                    udiff = sampler.u2(rng_mod.set2d_diffuse(s, depth), pix,
                                       samp)
                    uspec = sampler.u2(rng_mod.set2d_spec(s, depth), pix, samp)
                    buu, bvv = onb(n)
                    ds = cosine_hemisphere(udiff[0], udiff[1])
                    dbounce = buu * ds[0] + bvv * ds[1] + n * ds[2]
                    dbounce /= np.linalg.norm(dbounce)
                    lam_pdf = ds[2] / PI
                    if kind == 0:
                        wi, f, pdf = dbounce, c_a / PI, lam_pdf
                    elif kind == 5:
                        # refractive: Fresnel-weighted reflect/refract,
                        # cosine lobe around the chosen axis, TIR fallback
                        # (mirror of rayn_tpu.ops.bsdf scatter kind 5)
                        ior = scene.ior[mat]
                        cos_i = float(np.dot(wo, n))
                        entering = cos_i > 0.0
                        n_ref = n if entering else -n
                        eta = 1.0 / ior if entering else ior
                        ci = abs(cos_i)
                        sin2_t = eta * eta * max(0.0, 1.0 - ci * ci)
                        tir = sin2_t > 1.0
                        cos_t = np.sqrt(max(0.0, 1.0 - sin2_t))
                        refr_dir = -wo * eta + n_ref * (eta * ci - cos_t)
                        nrm = np.linalg.norm(refr_dir)
                        refr_dir = refr_dir / (nrm if nrm > 1e-20 else 1e-20)
                        f0 = ((1.0 - ior) / (1.0 + ior)) ** 2
                        fr = schlick(ci, f0)
                        refl_dir = 2 * np.dot(wo, n_ref) * n_ref - wo
                        take_reflect = (uf < fr) or tir
                        axis = refl_dir if take_reflect else refr_dir
                        auu, avv = onb(axis)
                        rs = cosine_hemisphere(udiff[0], udiff[1])
                        wi = auu * rs[0] + avv * rs[1] + axis * rs[2]
                        wi /= np.linalg.norm(wi)
                        pdf = max(rs[2] / PI, 1e-6)
                        colr = (np.ones(3) if take_reflect
                                else c_a)
                        ndl_r = max(abs(float(np.dot(wi, n))), 1e-6)
                        f = colr * (pdf / ndl_r)
                    else:
                        power = scene.power[mat]
                        refl = 2 * np.dot(wo, n) * n - wo
                        ruu, rvv = onb(refl)
                        ss = cosine_power(uspec[0], uspec[1], power)
                        sbounce = ruu * ss[0] + rvv * ss[1] + refl * ss[2]
                        sbounce /= np.linalg.norm(sbounce)
                        cap = max(ss[2] ** power, 1.1920929e-07)
                        spdf = (power + 1) / (2 * PI) * cap
                        scoeff = 0.0 if np.dot(n, sbounce) < 0 else \
                            (power + 2) / (2 * PI) * cap
                        if kind == 4:  # metallic: Phong only, colored Fresnel
                            a_c = c_a
                            cosw = abs(float(np.dot(n, wo)))
                            fres_c = a_c + (1 - a_c) * (1 - cosw) ** 5
                            wi = sbounce
                            f = fres_c * scoeff
                            pdf = spdf
                        else:
                            fr = schlick(abs(float(np.dot(n, wo))))
                            if uf < fr:
                                wi = sbounce
                                f = np.array([scoeff] * 3)
                            else:
                                wi = dbounce
                                f = c_a / PI
                            pdf = fr * spdf + (1 - fr) * max(1e-5, lam_pdf)
                    ndl = abs(float(np.dot(wi, n)))
                    new_tp = tp * vol_trans * f * ndl / pdf
                    if depth > 2:
                        rf = max(1.0 - tp.max(), 0.05)
                        # rf == 1.0 only for black throughput (0/0 would
                        # warn); the path is roulette-killed below (ur <
                        # 1.0 always) and new_tp is never consumed.
                        if rf < 1.0:
                            new_tp = new_tp / (1.0 - rf)
                    else:
                        rf = 0.0
                    ur = sampler.u1(rng_mod.set1d_roulette(s, depth), pix,
                                    samp)
                    if depth >= s.max_bounces or ur < rf:
                        color[py, px] += radiance
                        break
                    if not np.any(np.isnan(new_tp)):
                        tp = new_tp
                    o = p + n * (np.sign(np.dot(n, wi)) * offset_by)
                    d = wi

    spp = float(s.spp)
    return {
        "color": color / spp,
        "alpha": alpha / spp,
        "background": background / spp,
        "normal": normal_img / spp,
    }
