"""Scene bootstrap from 3D tracks (counterpart of
/root/reference/flow3d/init_utils.py).

One-time host-side preprocessing (numpy/sklearn where the reference used
cuml/cupy — SURVEY.md §2.2) followed by a jitted optax pre-optimization:

  * fg Gaussians from canonical-frame track positions (knn-mean scales,
    logit colors/opacities);
  * bg Gaussians from unprojected static points with normal-aligned quats;
  * motion bases: outlier-filtered tracks, velocity-direction k-means
    clustering, per-cluster per-frame weighted Procrustes SE(3) fits
    chained from the canonical frame;
  * ``run_initial_optim``: Adam pre-optimization of bases + coefs + means
    against 3D/2D track losses — a single jitted step scanned on device
    (the reference runs 1000 host-side torch steps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.neighbors import NearestNeighbors

from deblur4dgs_tpu.data.observations import StaticObservations, TrackObservations
from deblur4dgs_tpu.models.gaussians import Gaussians
from deblur4dgs_tpu.models.motion_bases import MotionBases, compute_transforms
from deblur4dgs_tpu.ops import lie
from deblur4dgs_tpu.train import losses as L


def _logit(x):
    x = np.clip(x, 1e-6, 1 - 1e-6)
    return np.log(x) - np.log1p(-x)


def knn_dists(x: np.ndarray, k: int) -> np.ndarray:
    """Mean distance to k nearest neighbors (excluding self)."""
    nn = NearestNeighbors(n_neighbors=k + 1).fit(x)
    d, _ = nn.kneighbors(x)
    return d[:, 1:].astype(np.float32)


def init_fg_from_tracks_3d(
    cano_t: int, tracks_3d: TrackObservations, motion_coefs: jnp.ndarray,
    seed: int = 0,
) -> Gaussians:
    """init_utils.py:32-62 semantics."""
    xyz = np.asarray(tracks_3d.xyz)
    num_fg = xyz.shape[0]
    colors = _logit(np.asarray(tracks_3d.colors))
    d = knn_dists(xyz[:, cano_t], 3).mean(axis=-1, keepdims=True)
    lo, hi = np.quantile(d, 0.05), np.quantile(d, 0.95)
    scales = np.log(np.clip(d, lo, hi)).repeat(3, axis=-1)
    rng = np.random.default_rng(seed)
    return Gaussians(
        means=jnp.asarray(xyz[:, cano_t]),
        quats=jnp.asarray(rng.uniform(size=(num_fg, 4)).astype(np.float32)),
        scales=jnp.asarray(scales.astype(np.float32)),
        colors=jnp.asarray(colors.astype(np.float32)),
        opacities=jnp.full((num_fg,), float(_logit(0.7)), jnp.float32),
        motion_coefs=jnp.asarray(motion_coefs),
    )


def init_bg(points: StaticObservations) -> tuple[Gaussians, float]:
    """init_utils.py:65-111: unprojected static points, normal-aligned
    quats. Returns (gaussians, bg_scene_scale)."""
    xyz = np.asarray(points.xyz)
    n = xyz.shape[0]
    center = xyz.mean(0)
    centered = xyz - center
    scene_scale = float(
        np.max(np.quantile(centered, 0.95, axis=0) - np.quantile(centered, 0.05, axis=0))
        / 2.0
    )
    colors = _logit(np.asarray(points.colors))
    d = knn_dists(xyz, 3).mean(axis=-1, keepdims=True)
    scales = np.log(np.maximum(d, 1e-6)).repeat(3, axis=-1)

    # quats rotating +z to the point normal (init_utils.py:92-98)
    normals = np.asarray(points.normals)
    normals = normals / np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-8)
    z = np.array([0.0, 0.0, 1.0])
    axis = np.cross(np.broadcast_to(z, normals.shape), normals)
    axis_n = np.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / np.maximum(axis_n, 1e-8)
    ang = np.arccos(np.clip((normals * z).sum(-1, keepdims=True), -1, 1))
    quats = np.asarray(lie.quat_exp(jnp.asarray((axis * ang).astype(np.float32))))

    return (
        Gaussians(
            means=jnp.asarray(xyz.astype(np.float32)),
            quats=jnp.asarray(quats),
            scales=jnp.asarray(scales.astype(np.float32)),
            colors=jnp.asarray(colors.astype(np.float32)),
            opacities=jnp.full((n,), float(_logit(0.7)), jnp.float32),
        ),
        scene_scale,
    )


def interp_masked(vals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Linearly interpolate masked-out (occluded) track samples over time.

    vals: (G, T, 3); mask: (G, T) bool. numpy replacement for the cupy
    implementation (init_utils.py:594-654)."""
    G, T = mask.shape
    out = vals.copy()
    t = np.arange(T)
    for g in range(G):
        m = mask[g].astype(bool)
        if m.sum() == 0:
            continue
        for c in range(vals.shape[-1]):
            out[g, :, c] = np.interp(t, t[m], vals[g, m, c])
    return out


def kmeans(x: np.ndarray, k: int, iters: int = 50, seed: int = 0) -> np.ndarray:
    """Plain numpy k-means labels (replaces cuml KMeans)."""
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(x.shape[0], size=k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        labels = d.argmin(1)
        for j in range(k):
            sel = labels == j
            if sel.any():
                centers[j] = x[sel].mean(0)
    return labels


def sample_initial_bases_centers(
    cano_t: int, tracks_3d: TrackObservations, num_bases: int, seed: int = 0,
    mode: str = "kmeans",
):
    """init_utils.py:534-592: cluster velocity directions, centers =
    per-cluster median canonical positions. mode: 'kmeans' | 'hdbscan'
    (the reference's cuml backends -> numpy/sklearn)."""
    xyz = np.asarray(tracks_3d.xyz)
    visibles = np.asarray(tracks_3d.visibles)
    xyz_interp = interp_masked(xyz, visibles)
    vel = xyz_interp[:, 1:] - xyz_interp[:, :-1]
    vel_dirs = (vel / (np.linalg.norm(vel, axis=-1, keepdims=True) + 1e-5)).reshape(
        xyz.shape[0], -1
    )
    if mode == "hdbscan":
        from sklearn.cluster import HDBSCAN

        model = HDBSCAN(
            min_cluster_size=20,
            max_cluster_size=max(xyz.shape[0] // 4, 21),
        )
        labels = model.fit(vel_dirs).labels_
        labels = np.where(labels < 0, 0, labels)  # noise -> cluster 0
        num_bases = int(labels.max()) + 1
    else:
        labels = kmeans(vel_dirs, num_bases, seed=seed)
    centers = np.stack(
        [np.median(xyz[labels == i, cano_t], axis=0) for i in range(num_bases)]
    )
    return centers, labels


def get_weights_for_procrustes(cluster: np.ndarray, visibilities: np.ndarray):
    """loss_utils.py:102-115. cluster: (T, P, 3); vis: (T, P)."""
    med = np.median(cluster, axis=-2, keepdims=True)
    d = np.linalg.norm(cluster - med, axis=-1)
    d = d / (np.median(d, axis=-1, keepdims=True) + 1e-12)
    w = np.exp(-d)
    w = w / (w.mean(axis=-1, keepdims=True) + 1e-6)
    w = w * (visibilities.astype(np.float32) + 1e-6)
    invalid = d > np.quantile(d, 0.9)
    invalid |= np.isnan(w)
    w[invalid] = 0
    return w


def init_motion_params_with_procrustes(
    tracks_3d: TrackObservations,
    num_bases: int,
    cano_t: int,
    min_mean_weight: float = 0.1,
    seed: int = 0,
) -> tuple[MotionBases, jnp.ndarray, TrackObservations]:
    """init_utils.py:114-270: outlier filter, cluster, chained per-frame
    weighted Procrustes SE(3) fits (6D rotation output)."""
    xyz = np.asarray(tracks_3d.xyz)
    num_frames = xyz.shape[1]
    means_cano = xyz[:, cano_t]

    center = np.median(means_cano, axis=0)
    dists = np.linalg.norm(means_cano - center, axis=-1)
    valid = dists < np.quantile(dists, 0.95)
    valid &= np.asarray(tracks_3d.visibles).any(axis=1)
    tracks_3d = TrackObservations(*[np.asarray(x)[valid] for x in tracks_3d])
    means_cano = means_cano[valid]

    centers, labels = sample_initial_bases_centers(
        cano_t, tracks_3d, num_bases, seed=seed
    )

    d2c = np.linalg.norm(means_cano[:, None] - centers[None], axis=-1)
    motion_coefs = 10 * np.exp(-d2c)  # (G, K) pre-softmax

    id_rot = np.array([1.0, 0, 0, 0, 1, 0], np.float32)
    init_rots = np.tile(id_rot, (num_bases, num_frames, 1))
    init_ts = np.zeros((num_bases, num_frames, 3), np.float32)

    tgt_ts = list(range(cano_t - 1, -1, -1)) + list(range(cano_t, num_frames))
    solve = jax.jit(
        functools.partial(lie.solve_procrustes, enforce_se3=True)
    )
    for n in range(num_bases):
        sel = labels == n
        cluster = np.asarray(tracks_3d.xyz)[sel].swapaxes(0, 1)  # (T, P, 3)
        vis = np.asarray(tracks_3d.visibles)[sel].swapaxes(0, 1)
        conf = np.asarray(tracks_3d.confidences)[sel].swapaxes(0, 1)
        weights = get_weights_for_procrustes(cluster, vis)
        prev_t = cano_t
        for cur_t in tgt_ts:
            w = weights[cano_t] * weights[cur_t] * (conf[cano_t] + conf[cur_t]) / 2
            if w.sum() < min_mean_weight * num_frames:
                init_rots[n, cur_t] = init_rots[n, prev_t]
                init_ts[n, cur_t] = init_ts[n, prev_t]
            else:
                (q, t, _), _ = solve(
                    jnp.asarray(cluster[cano_t]),
                    jnp.asarray(cluster[cur_t]),
                    jnp.asarray(w.astype(np.float32)),
                )
                R = np.asarray(lie.quat_to_rmat(q))
                init_rots[n, cur_t] = np.asarray(
                    lie.rmat_to_cont_6d(jnp.asarray(R))
                )
                init_ts[n, cur_t] = np.asarray(t)
            prev_t = cur_t

    bases = MotionBases(
        rots=jnp.asarray(init_rots), transls=jnp.asarray(init_ts)
    )
    return bases, jnp.asarray(motion_coefs.astype(np.float32)), TrackObservations(
        *[jnp.asarray(np.asarray(x)) for x in tracks_3d]
    )


# ---------------------------------------------------------------------------
# Initial optimization (init_utils.py:273-443)
# ---------------------------------------------------------------------------


def project_2d_tracks(xyz, Ks, w2cs):
    """xyz: (G, T, 3) world; Ks/w2cs: (T, 3, 3)/(T, 4, 4).
    Returns (uv (G, T, 2), depth (G, T))."""
    cam = jnp.einsum("tij,gtj->gti", w2cs[:, :3, :3], xyz) + w2cs[None, :, :3, 3]
    uvz = jnp.einsum("tij,gtj->gti", Ks, cam)
    depth = jnp.maximum(uvz[..., 2], 1e-6)
    return uvz[..., :2] / depth[..., None], depth


def run_initial_optim(
    fg: Gaussians,
    bases: MotionBases,
    tracks_3d: TrackObservations,
    Ks: jnp.ndarray,
    w2cs: jnp.ndarray,
    num_iters: int = 1000,
) -> tuple[Gaussians, MotionBases]:
    """Adam pre-optimization of (bases, coefs, means) against track losses,
    scanned on-device."""
    import optax

    num_frames = bases.num_frames
    ts = jnp.arange(num_frames, dtype=jnp.float32)
    tsc = jnp.clip(ts, 1, num_frames - 2)
    ts_nb = jnp.concatenate([tsc - 1, tsc, tsc + 1])

    gt_2d, gt_depth = project_2d_tracks(tracks_3d.xyz, Ks, w2cs)
    vis_conf = (
        tracks_3d.visibles.astype(jnp.float32) * tracks_3d.confidences
    )[..., None]
    invis_conf = (
        tracks_3d.invisibles.astype(jnp.float32) * tracks_3d.confidences
    )[..., None]

    params = {
        "rots": bases.rots,
        "transls": bases.transls,
        "coefs": fg.motion_coefs,
        "means": fg.means,
    }
    opt = optax.chain(
        optax.scale_by_adam(),
        optax.masked(optax.scale(-1e-2), {"rots": True, "transls": False, "coefs": True, "means": False}),
        optax.masked(optax.scale(-3e-2), {"rots": False, "transls": True, "coefs": False, "means": False}),
        optax.masked(optax.scale(-1e-3), {"rots": False, "transls": False, "coefs": False, "means": True}),
    )
    # exponential lr decay to 0.1x over num_iters
    decay = optax.scale_by_schedule(
        lambda step: 0.1 ** (step / num_iters)
    )
    opt = optax.chain(opt, decay)
    opt_state = opt.init(params)

    def w_smooth(i, min_v, max_v, th=400):
        return jnp.where(
            i <= th, min_v, (max_v - min_v) * (i - th) / (num_iters - th) + min_v
        )

    def loss_fn(params, i):
        b = MotionBases(params["rots"], params["transls"])
        coefs = jax.nn.softmax(params["coefs"], axis=-1)
        transfms = compute_transforms(b, ts, coefs)
        means_h = jnp.concatenate(
            [params["means"], jnp.ones_like(params["means"][:, :1])], -1
        )
        positions = jnp.einsum("gtij,gj->gti", transfms, means_h)  # (G, T, 3)

        loss = L.masked_l1_loss(positions, tracks_3d.xyz, mask=vis_conf[..., 0])
        pred_2d, pred_depth = project_2d_tracks(positions, Ks, w2cs)
        loss += 0.5 * L.masked_l1_loss(
            pred_2d, gt_2d, mask=invis_conf[..., 0], quantile=0.95
        ) / Ks[0, 0, 0]

        loss += 0.01 * (1.0 - jnp.mean(jnp.sum(coefs**2, axis=-1)))

        ws = w_smooth(i, 0.01, 0.1)
        loss += ws * L.compute_se3_smoothness_loss(params["rots"], params["transls"])
        loss += ws * 0.5 * L.compute_accel_loss(positions)

        transfms_nb = compute_transforms(b, ts_nb, coefs)
        means_nb = jnp.einsum("gtij,gj->gti", transfms_nb, means_h)
        means_nb = means_nb.reshape(means_nb.shape[0], 3, -1, 3)
        loss += 0.1 * L.compute_z_acc_loss(means_nb, w2cs)
        return loss

    @jax.jit
    def step(carry, i):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, i)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt_state), jnp.arange(num_iters, dtype=jnp.float32)
    )
    fg = fg._replace(means=params["means"], motion_coefs=params["coefs"])
    bases = MotionBases(params["rots"], params["transls"])
    return fg, bases, losses
