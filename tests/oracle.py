"""NumPy oracle: a direct scalar-per-ray transcription of the reference
integrators (src/camera.h:245-475), consuming the same injected uniform
tensors and the same slot layout as the jax wavefront implementations.

Used only in tests.  With x64 scenes and identical uniforms, the jax
implementations must agree to ~1e-12.
"""

from __future__ import annotations

import numpy as np

MAT_LAMBERTIAN, MAT_METAL, MAT_DIELECTRIC, MAT_LIGHT, MAT_ISOTROPIC = range(5)
PI = 3.1415926535897932385
T_MIN = 1e-3
EPS_MT = 1e-8

# PT slots (bpt_tpu.models.pt)
U_MIX, U_LPICK, U_LU, U_LV, U_B1, U_B2, U_DIEL, U_FZ1, U_FZ2 = range(9)
# trace slots (bpt_tpu.models.bdpt)
TU_B1, TU_B2, TU_DIEL, TU_FZ1, TU_FZ2 = range(5)
LS_PICK, LS_U, LS_V, LS_D1, LS_D2 = range(5)


class SceneNP:
    def __init__(self, scene):
        for name in (
            "v0", "e1", "e2", "normal", "area",
            "light_v0", "light_e1", "light_e2", "light_normal", "light_area",
            "light_cdf", "background",
        ):
            setattr(self, name, np.asarray(getattr(scene, name), np.float64))
        self.mat_id = np.asarray(scene.mat_id)
        self.light_mat = np.asarray(scene.light_mat)
        self.vol_v0 = np.asarray(scene.vol_v0, np.float64)
        self.vol_e1 = np.asarray(scene.vol_e1, np.float64)
        self.vol_e2 = np.asarray(scene.vol_e2, np.float64)
        self.vol_tri_vol = np.asarray(scene.vol_tri_vol)
        self.vol_neg_inv_density = np.asarray(scene.vol_neg_inv_density, np.float64)
        self.vol_mat = np.asarray(scene.vol_mat)
        self.num_volumes = scene.num_volumes
        self.mtype = np.asarray(scene.materials.mtype)
        self.albedo = np.asarray(scene.materials.albedo, np.float64)
        self.fuzz = np.asarray(scene.materials.fuzz, np.float64)
        self.ior = np.asarray(scene.materials.ior, np.float64)
        self.total_area = float(scene.light_total_area)
        self.num_lights = scene.num_lights


def dot(a, b):
    return np.sum(a * b, axis=-1)


def normalize_safe(v, eps=1e-20):
    n2 = dot(v, v)
    inv = 1.0 / np.sqrt(np.maximum(n2, eps)) if n2 > eps else 0.0
    return v * inv


def reflect(v, n):
    return v - 2.0 * dot(v, n) * n


def refract(uv, n, eta):
    cos_t = min(dot(-uv, n), 1.0)
    r_perp = eta * (uv + cos_t * n)
    r_par = -np.sqrt(abs(1.0 - dot(r_perp, r_perp))) * n
    return r_perp + r_par


def schlick(cosine, ri):
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def onb_from_w(n):
    w = n / np.sqrt(dot(n, n))
    a = np.array([0.0, 1.0, 0.0]) if abs(w[0]) > 0.9 else np.array([1.0, 0.0, 0.0])
    v = np.cross(w, a)
    v = v / np.sqrt(dot(v, v))
    u = np.cross(w, v)
    return u, v, w


def cosine_world(n, u1, u2):
    phi = 2.0 * PI * u1
    x = np.cos(phi) * np.sqrt(u2)
    y = np.sin(phi) * np.sqrt(u2)
    z = np.sqrt(1.0 - u2)
    u, v, w = onb_from_w(n)
    return x * u + y * v + z * w


def sphere_dir(u1, u2):
    z = 1.0 - 2.0 * u1
    r = np.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return np.array([r * np.cos(phi), r * np.sin(phi), z])


class HitRec:
    __slots__ = ("t", "p", "normal", "front", "mat", "tri", "u", "v")


def closest_hit(s: SceneNP, o, d, tmin, tmax):
    pvec = np.cross(d, s.e2)
    det = np.sum(s.e1 * pvec, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tvec = o - s.v0
        u = np.sum(tvec * pvec, axis=-1) * inv
        qvec = np.cross(tvec, s.e1)
        v = np.sum(d * qvec, axis=-1) * inv
        t = np.sum(s.e2 * qvec, axis=-1) * inv
    valid = (
        (np.abs(det) >= EPS_MT)
        & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (t >= tmin) & (t <= tmax)
    )
    t = np.where(valid, t, np.inf)
    idx = int(np.argmin(t))
    if not np.isfinite(t[idx]):
        return None
    rec = HitRec()
    rec.t = t[idx]
    rec.tri = idx
    rec.u, rec.v = u[idx], v[idx]
    rec.p = o + rec.t * d
    outward = s.normal[idx]
    rec.front = dot(d, outward) < 0
    rec.normal = outward if rec.front else -outward
    rec.mat = int(s.mat_id[idx])
    return rec


def _vol_closest(s: SceneNP, vid, o, d, tmin, tmax):
    mask = s.vol_tri_vol == vid
    pvec = np.cross(d, s.vol_e2)
    det = np.sum(s.vol_e1 * pvec, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tvec = o - s.vol_v0
        u = np.sum(tvec * pvec, axis=-1) * inv
        qvec = np.cross(tvec, s.vol_e1)
        v = np.sum(d * qvec, axis=-1) * inv
        t = np.sum(s.vol_e2 * qvec, axis=-1) * inv
    valid = (
        mask
        & (np.abs(det) >= EPS_MT)
        & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (t >= tmin) & (t <= tmax)
    )
    t = np.where(valid, t, np.inf)
    tm = t.min()
    return tm if np.isfinite(tm) else None


def apply_volumes(s: SceneNP, o, d, rec, u_vols, tmin=T_MIN):
    """constant_medium::hit (constant_medium.h:24-56) applied after the
    surface hit, volumes as-if-appended-last."""
    t_best = rec.t if rec is not None else np.inf
    out = rec
    for vid in range(s.num_volumes):
        t1 = _vol_closest(s, vid, o, d, -np.inf, np.inf)
        if t1 is None:
            continue
        t2 = _vol_closest(s, vid, o, d, t1 + 1e-4, np.inf)
        if t2 is None:
            continue
        tt1 = max(t1, tmin)
        tt2 = min(t2, t_best)
        if tt1 >= tt2:
            continue
        tt1 = max(tt1, 0.0)
        d_len = np.sqrt(dot(d, d))
        dist_inside = (tt2 - tt1) * d_len
        hd = s.vol_neg_inv_density[vid] * np.log(u_vols[vid])
        if hd > dist_inside:
            continue
        tv = tt1 + hd / d_len
        t_best = tv
        r = HitRec()
        r.t = tv
        r.tri = -1
        r.u = r.v = 0.0
        r.p = o + tv * d
        r.normal = np.array([1.0, 0.0, 0.0])
        r.front = True
        r.mat = int(s.vol_mat[vid])
        out = r
    return out


def any_hit(s: SceneNP, o, d, tmin, tmax):
    pvec = np.cross(d, s.e2)
    det = np.sum(s.e1 * pvec, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tvec = o - s.v0
        u = np.sum(tvec * pvec, axis=-1) * inv
        qvec = np.cross(tvec, s.e1)
        v = np.sum(d * qvec, axis=-1) * inv
        t = np.sum(s.e2 * qvec, axis=-1) * inv
    valid = (
        (np.abs(det) >= EPS_MT)
        & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (t >= tmin) & (t <= tmax)
    )
    return bool(valid.any())


def emitted(s: SceneNP, mat, front):
    if s.mtype[mat] == MAT_LIGHT and front:
        return s.albedo[mat].copy()
    return np.zeros(3)


def light_pdf_value(s: SceneNP, origin, direction):
    """triangle_collection::pdf_value (triangle.h:170-181)."""
    pvec = np.cross(direction, s.light_e2)
    det = np.sum(s.light_e1 * pvec, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tvec = origin - s.light_v0
        u = np.sum(tvec * pvec, axis=-1) * inv
        qvec = np.cross(tvec, s.light_e1)
        v = np.sum(direction * qvec, axis=-1) * inv
        t = np.sum(s.light_e2 * qvec, axis=-1) * inv
    valid = (
        (np.abs(det) >= EPS_MT)
        & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        & (t >= T_MIN)
    )
    d_len2 = dot(direction, direction)
    d_len = np.sqrt(d_len2)
    dist2 = t * t * d_len2
    cosine = np.abs(np.sum(direction * s.light_normal, axis=-1)) / d_len
    ok = valid & (s.light_area > 0) & (cosine > 0)
    pdf = np.where(ok, dist2 / np.where(ok, cosine * s.light_area, 1.0), 0.0)
    return float(np.sum(pdf)) / s.num_lights


def tri_fold(u1, u2):
    if u1 + u2 > 1.0:
        return 1.0 - u1, 1.0 - u2
    return u1, u2


def sample_light_dir(s: SceneNP, origin, u_pick, u1, u2):
    L = s.num_lights
    idx = min(max(int(u_pick * L), 0), L - 1)
    u, v = tri_fold(u1, u2)
    p = s.light_v0[idx] + u * s.light_e1[idx] + v * s.light_e2[idx]
    return p - origin


def delta_dir(s: SceneNP, mat, d_in, normal, front, u_diel, u_f1, u_f2):
    if s.mtype[mat] == MAT_METAL:
        fuzz = s.fuzz[mat]
        return normalize_safe(reflect(d_in, normal)) + fuzz * sphere_dir(u_f1, u_f2)
    ior = s.ior[mat]
    ri = (1.0 / ior) if front else ior
    ud = normalize_safe(d_in)
    cos_t = min(dot(-ud, normal), 1.0)
    sin_t = np.sqrt(max(0.0, 1.0 - cos_t * cos_t))
    if ri * sin_t > 1.0 or schlick(cos_t, ri) > u_diel:
        return reflect(ud, normal)
    return refract(ud, normal, ri)


def bsdf_sample_dir(s: SceneNP, mat, normal, u1, u2):
    if s.mtype[mat] == MAT_ISOTROPIC:
        return sphere_dir(u1, u2)
    return cosine_world(normal, u1, u2)


def bsdf_pdf_value(s: SceneNP, mat, normal, direction):
    if s.mtype[mat] == MAT_ISOTROPIC:
        return 1.0 / (4.0 * PI)
    cos_t = dot(normalize_safe(direction), normal)
    return max(0.0, cos_t / PI)


def scattering_pdf(s: SceneNP, mat, normal, direction):
    mt = s.mtype[mat]
    if mt == MAT_ISOTROPIC:
        return 1.0 / (4.0 * PI)
    if mt == MAT_LAMBERTIAN:
        cos_t = dot(normal, normalize_safe(direction))
        return 0.0 if cos_t < 0 else cos_t / PI
    return 0.0


def attenuation(s: SceneNP, mat):
    if s.mtype[mat] == MAT_DIELECTRIC:
        return np.ones(3)
    return s.albedo[mat].copy()


def evaluate_bsdf(s: SceneNP, mat):
    mt = s.mtype[mat]
    if mt == MAT_LAMBERTIAN:
        return s.albedo[mat] / PI
    if mt == MAT_ISOTROPIC:
        return s.albedo[mat] / (4.0 * PI)
    return np.zeros(3)


# ------------------------------------------------------------------- PT


def pt_radiance(s: SceneNP, o, d, max_depth, U):
    """path_trace_color (camera.h:255-292). U: [max_depth, 9]."""
    o = np.asarray(o, np.float64).copy()
    d = np.asarray(d, np.float64).copy()
    thr = np.ones(3)
    rad = np.zeros(3)
    bg = np.asarray(s.background, np.float64)
    for b in range(max_depth):
        u = U[b]
        rec = closest_hit(s, o, d, T_MIN, np.inf)
        if s.num_volumes:
            rec = apply_volumes(s, o, d, rec, u[9:])
        if rec is None:
            rad = rad + thr * bg
            return rad
        mt = s.mtype[rec.mat]
        delta = mt in (MAT_METAL, MAT_DIELECTRIC)
        emission = emitted(s, rec.mat, rec.front)
        if not delta:
            rad = rad + thr * emission
        if mt == MAT_LIGHT:
            return rad
        atten = attenuation(s, rec.mat)
        if delta:
            nd = delta_dir(s, rec.mat, d, rec.normal, rec.front,
                           u[U_DIEL], u[U_FZ1], u[U_FZ2])
            thr = thr * atten
            o, d = rec.p, nd
            continue
        light_dir = sample_light_dir(s, rec.p, u[U_LPICK], u[U_LU], u[U_LV])
        bdir = bsdf_sample_dir(s, rec.mat, rec.normal, u[U_B1], u[U_B2])
        nd = light_dir if u[U_MIX] < 0.5 else bdir
        pdf = 0.5 * light_pdf_value(s, rec.p, nd) + \
            0.5 * bsdf_pdf_value(s, rec.mat, rec.normal, nd)
        if not pdf > 0.0:
            return rad
        w = scattering_pdf(s, rec.mat, rec.normal, nd) / pdf
        thr = thr * atten * w
        o, d = rec.p, nd
    return rad


# ------------------------------------------------------------------ BDPT


class Vtx:
    __slots__ = ("p", "normal", "wi", "thr", "emit", "mat", "u", "v",
                 "delta", "is_light")


def trace_path(s: SceneNP, o, d, thr, depth, U, collect_bg):
    """trace_path (camera.h:325-370). U: [depth, 5]."""
    o = np.asarray(o, np.float64).copy()
    d = np.asarray(d, np.float64).copy()
    thr = np.asarray(thr, np.float64).copy()
    path = []
    bg = np.zeros(3)
    for b in range(depth):
        u = U[b]
        rec = closest_hit(s, o, d, T_MIN, np.inf)
        if s.num_volumes:
            rec = apply_volumes(s, o, d, rec, u[5:])
        if rec is None:
            if collect_bg:
                bg = bg + thr * np.asarray(s.background, np.float64)
            break
        mt = s.mtype[rec.mat]
        vtx = Vtx()
        vtx.p = rec.p
        vtx.normal = rec.normal
        vtx.wi = normalize_safe(-d)
        vtx.thr = thr.copy()
        vtx.emit = emitted(s, rec.mat, rec.front)
        vtx.mat = rec.mat
        vtx.u, vtx.v = rec.u, rec.v
        vtx.delta = mt in (MAT_METAL, MAT_DIELECTRIC)
        vtx.is_light = mt == MAT_LIGHT
        path.append(vtx)
        if mt == MAT_LIGHT:
            break
        atten = attenuation(s, rec.mat)
        if vtx.delta:
            nd = delta_dir(s, rec.mat, d, rec.normal, rec.front,
                           u[TU_DIEL], u[TU_FZ1], u[TU_FZ2])
            thr = thr * atten
            o, d = rec.p, nd
            continue
        nd = bsdf_sample_dir(s, rec.mat, rec.normal, u[TU_B1], u[TU_B2])
        pdf = bsdf_pdf_value(s, rec.mat, rec.normal, nd)
        if not pdf > 0.0:
            break
        w = scattering_pdf(s, rec.mat, rec.normal, nd) / pdf
        thr = thr * atten * w
        o, d = rec.p, nd
    return path, bg


def build_light_path(s: SceneNP, depth, ls_u, U):
    """build_light_path (camera.h:372-418). ls_u: [5], U: [depth-1, 5]."""
    if depth <= 0 or s.num_lights == 0 or not s.total_area > 0:
        return None
    pick = ls_u[LS_PICK] * s.total_area
    idx = int(np.searchsorted(s.light_cdf, pick, side="left"))
    idx = min(max(idx, 0), s.num_lights - 1)
    u, v = tri_fold(ls_u[LS_U], ls_u[LS_V])
    pos = s.light_v0[idx] + u * s.light_e1[idx] + v * s.light_e2[idx]
    n = s.light_normal[idx]
    mat = int(s.light_mat[idx])
    pdf = 1.0 / s.total_area

    emission = emitted(s, mat, True)
    if not dot(emission, emission) > 0.0:
        return None

    v0 = Vtx()
    v0.p = pos
    v0.normal = n
    v0.wi = n
    v0.thr = np.ones(3) / max(pdf, 1e-8)
    v0.emit = emission
    v0.mat = mat
    v0.u = v0.v = 0.0
    v0.delta = False
    v0.is_light = True
    path = [v0]

    dir_unit = normalize_safe(cosine_world(n, ls_u[LS_D1], ls_u[LS_D2]))
    cos_t = max(0.0, dot(n, dir_unit))
    if cos_t <= 0:
        return path
    pdf_dir = max(cos_t / PI, 1e-8)
    thr = v0.thr * emission * (cos_t / pdf_dir)
    o = pos + 0.001 * n
    tail, _ = trace_path(s, o, dir_unit, thr, depth - 1, U, collect_bg=False)
    return path + tail


def connect(s: SceneNP, cam_v: Vtx, light_v: Vtx, one_sided=False):
    """connect_vertices (camera.h:440-475).  one_sided (bdpt-mis only):
    reject back-hemisphere connections — the reference's abs() cosines
    transport light through the BACK of one-sided lambertian surfaces,
    paths the forward strategies can never sample (isotropic scatterers
    stay two-sided, matching their spherical pdf)."""
    if cam_v.delta or light_v.delta:
        return np.zeros(3)
    diff = light_v.p - cam_v.p
    dist2 = dot(diff, diff)
    if dist2 <= 0:
        return np.zeros(3)
    dist = np.sqrt(max(dist2, 1e-30))
    du = diff / dist
    sgn_cam = dot(cam_v.normal, du)
    sgn_light = dot(light_v.normal, -du)
    if one_sided:
        if s.mtype[cam_v.mat] != MAT_ISOTROPIC and sgn_cam <= 0:
            return np.zeros(3)
        if s.mtype[light_v.mat] != MAT_ISOTROPIC and sgn_light <= 0:
            return np.zeros(3)
    cos_cam = abs(sgn_cam)
    cos_light = abs(sgn_light)
    if cos_cam <= 0 or cos_light <= 0:
        return np.zeros(3)
    max_t = dist - 0.001
    if max_t <= 0:
        return np.zeros(3)
    so = cam_v.p + 0.001 * du
    # endpoint margin — see bpt_tpu.models.bdpt.SHADOW_EPS_REL
    if any_hit(s, so, du, T_MIN, max_t * (1.0 - 1e-4)):
        return np.zeros(3)
    f_cam = evaluate_bsdf(s, cam_v.mat)
    if not dot(f_cam, f_cam) > 0:
        return np.zeros(3)
    f_light = light_v.emit if light_v.is_light else evaluate_bsdf(s, light_v.mat)
    if not dot(f_light, f_light) > 0:
        return np.zeros(3)
    cam_factor = cam_v.thr * f_cam
    light_factor = light_v.thr * f_light
    g = (cos_cam * cos_light) / max(dist2, 1e-30)
    return cam_factor * light_factor * g


def bdpt_radiance(s: SceneNP, o, d, max_depth, cam_U, ls_u, light_U):
    """bidirectional_color (camera.h:294-323)."""
    cam_path, bg = trace_path(s, o, d, np.ones(3), max_depth, cam_U, True)
    result = bg.copy()
    for vtx in cam_path:
        if not vtx.delta:
            result = result + vtx.thr * vtx.emit
    light_path = build_light_path(s, max_depth, ls_u, light_U)
    if light_path is None:
        return result
    for cv in cam_path:
        for lv in light_path:
            result = result + connect(s, cv, lv)
    return result


# -------------------------------------------------------------- BDPT + MIS
#
# OUR upgrade — the reference has no MIS anywhere (camera.h:440-475 is an
# unweighted all-pairs sum).  This oracle computes the power-heuristic
# (beta=2) weight by BRUTE-FORCE strategy enumeration: for each complete
# path it evaluates every realizable (s', t') generation pdf directly.
# The shipped jnp implementation (bpt_tpu.models.bdpt, mis=True) uses the
# O(depth) recursive-ratio form; agreement between the two is the test.


def _pdfA_between(s: SceneNP, from_v: Vtx, to_v: Vtx):
    """Area pdf of generating `to_v` from `from_v` via from_v's scattering
    pdf (incoming-independent for this material set: cosine lambertian /
    uniform-sphere isotropic / cos-pi emitter exit).  None = delta segment
    (deltas cancel across strategies; treated as factor 1)."""
    seg = to_v.p - from_v.p
    dist2 = dot(seg, seg)
    if dist2 <= 0:
        return 0.0
    du = seg / np.sqrt(dist2)
    if from_v.delta:
        return None
    pdf_sa = bsdf_pdf_value(s, from_v.mat, from_v.normal, du)
    return pdf_sa * abs(dot(to_v.normal, du)) / dist2


def _strategy_pdf(s: SceneNP, path, tprime):
    """pdf of generating `path` (camera-order vertex list) with exactly
    tprime camera vertices (s' = k - tprime light vertices).  The shared
    camera-ray pdf (x_0) is omitted — it cancels in every ratio.  Returns
    0 for strategies that cannot generate the path."""
    k = len(path)
    if tprime < k and not path[k - 1].is_light:
        return 0.0  # a light subpath must start on an emitter
    if tprime == k:
        if not path[k - 1].is_light:
            return 0.0
    else:
        if path[tprime - 1].delta or path[tprime].delta:
            return 0.0  # connection endpoints must be non-delta
    p = 1.0
    for i in range(1, tprime):  # camera side: x_1 .. x_{t'-1}
        q = _pdfA_between(s, path[i - 1], path[i])
        p *= 1.0 if q is None else q
    if tprime < k:
        p *= 1.0 / s.total_area  # emitter-area pdf of y_0 (triangle.h:199)
        for i in range(k - 2, tprime - 1, -1):  # y_1.. from the light end in
            q = _pdfA_between(s, path[i + 1], path[i])
            p *= 1.0 if q is None else q
    return p


def mis_weight(s: SceneNP, path, tprime, max_depth):
    """Power-heuristic weight of strategy tprime over every strategy the
    estimator realizes: t' in [max(1, k-max_depth), min(k, max_depth)]."""
    k = len(path)
    p_cur = _strategy_pdf(s, path, tprime)
    if not p_cur > 0.0:
        return 0.0
    denom = 0.0
    for t2 in range(max(1, k - max_depth), min(k, max_depth) + 1):
        denom += _strategy_pdf(s, path, t2) ** 2
    return p_cur * p_cur / denom


def bdpt_mis_radiance(s: SceneNP, o, d, max_depth, cam_U, ls_u, light_U):
    """bidirectional_color with power-heuristic MIS weights applied to the
    emission (s'=0) and connection (s'>=1) contributions."""
    cam_path, bg = trace_path(s, o, d, np.ones(3), max_depth, cam_U, True)
    result = bg.copy()
    for t, vtx in enumerate(cam_path, start=1):
        if not vtx.delta and dot(vtx.emit, vtx.emit) > 0:
            w = mis_weight(s, cam_path[:t], t, max_depth)
            result = result + w * vtx.thr * vtx.emit
    light_path = build_light_path(s, max_depth, ls_u, light_U)
    if light_path is None:
        return result
    for ti, cv in enumerate(cam_path, start=1):
        for si, lv in enumerate(light_path, start=1):
            c = connect(s, cv, lv, one_sided=True)
            if dot(c, c) > 0:
                full = cam_path[:ti] + list(reversed(light_path[:si]))
                w = mis_weight(s, full, ti, max_depth)
                result = result + w * c
    return result
