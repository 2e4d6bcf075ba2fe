"""Depth sorting + tile binning for the Pallas rasterizer.

TPU-native replacement for gsplat's tile-intersection + per-tile radix sort
(reference: gsplat v1.1.1 CUDA, called from
/root/reference/flow3d/scene_model.py:360). GPU 3DGS builds variable-length
per-tile lists with a global (tile_id, depth) radix sort; XLA wants static
shapes, so we instead:

  1. globally depth-sort all Gaussians once per view (stable argsort);
  2. for each tile, select the first CAP intersecting Gaussians in sorted
     order with a masked top-k (order-preserving, capacity-bounded);
  3. gather their screen-space params into a dense [T, F, CAP] array that
     the Pallas kernel consumes as VMEM blocks ([F, CAP] per tile,
     CAP on the 128-lane axis).

Overflowed tiles drop the *farthest* Gaussians (least visible under
front-to-back compositing). `counts` reports both capped and raw counts so
callers can monitor overflow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblur4dgs_tpu.ops.projection import Projected

TILE = 16  # pixels per tile side; P = TILE*TILE = 256 pixels per tile
# Tiles processed per Pallas program (amortizes per-program latency over
# more compute; tile rows are padded to a multiple of this).
TILE_BLOCK = 8


def pad_tiles(n: int, multiple: int = TILE_BLOCK) -> int:
    return -(-n // multiple) * multiple

# Packed feature layout along F (sublane) axis of tile_data:
#   0: mean2d.x   1: mean2d.y   2: conic.a   3: conic.b   4: conic.c
#   5: opacity    6: radius     7..7+D: channels
# Radius rides along so compositing can apply the per-pixel bounding-box
# cutoff that makes tile membership exactly determine contributions (the
# zero sentinel row then has radius 0 => contributes nothing by
# construction).
(
    F_MEAN_X,
    F_MEAN_Y,
    F_CONIC_A,
    F_CONIC_B,
    F_CONIC_C,
    F_OPACITY,
    F_RADIUS,
) = range(7)
F_CHANNELS = 7


class TileBinning(NamedTuple):
    tile_data: jnp.ndarray  # (T, F, CAP) packed per-tile gaussian params
    counts: jnp.ndarray  # (T,) int32 number of gaussians binned (<= CAP)
    gather_idx: jnp.ndarray  # (T, CAP) int32 indices into the *sorted* arrays
    order: jnp.ndarray  # (G,) sort order (sorted -> original index)
    raw_counts: jnp.ndarray  # (T,) int32 pre-cap intersection counts
    tiles_xy: tuple[int, int]  # (tiles_x, tiles_y)


def num_tiles(img_wh: tuple[int, int]) -> tuple[int, int]:
    W, H = img_wh
    return (-(-W // TILE), -(-H // TILE))


@functools.partial(jax.jit, static_argnames=("img_wh", "cap", "tile_batch"))
def bin_gaussians(
    proj: Projected,
    img_wh: tuple[int, int],
    cap: int = 512,
    tile_batch: int = 256,
):
    """Compute per-tile capacity-bounded index lists in depth order.

    Returns (gather_idx (T, CAP) into depth-sorted arrays, counts (T,),
    raw_counts (T,), order (G,)). Entries beyond counts point at index G
    (one past the end — callers append a zero sentinel row).
    """
    G = proj.depths.shape[0]
    tiles_x, tiles_y = num_tiles(img_wh)
    T = tiles_x * tiles_y

    key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(key, stable=True)  # (G,) front-most first
    mx = proj.means2d[order, 0]
    my = proj.means2d[order, 1]
    r = proj.radii[order]
    valid = proj.valid[order]

    # Tile rectangles.
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tids % tiles_x).astype(jnp.float32) * TILE
    ty0 = (tids // tiles_x).astype(jnp.float32) * TILE

    sorted_rank = jnp.arange(G, dtype=jnp.int32)

    def bin_tile_batch(tx0b, ty0b):
        # mask: (B, G) — bounding-square vs tile-rect overlap test
        inter = (
            (mx[None, :] + r[None, :] > tx0b[:, None])
            & (mx[None, :] - r[None, :] < tx0b[:, None] + TILE)
            & (my[None, :] + r[None, :] > ty0b[:, None])
            & (my[None, :] - r[None, :] < ty0b[:, None] + TILE)
            & valid[None, :]
        )
        raw = jnp.sum(inter, axis=1, dtype=jnp.int32)
        # order-preserving first-CAP selection: top-k of (G - rank) over mask
        score = jnp.where(inter, G - sorted_rank[None, :], 0)
        if G < cap:  # top_k needs k <= axis size
            score = jnp.pad(score, ((0, 0), (0, cap - G)))
        topv, _ = jax.lax.top_k(score, cap)  # descending => ascending rank
        idx = jnp.where(topv > 0, G - topv, G)  # G = sentinel (zero row)
        cnt = jnp.minimum(raw, cap)
        return idx.astype(jnp.int32), cnt, raw

    # Batch tiles through lax.map to bound the (B, G) mask working set.
    nb = -(-T // tile_batch)
    pad = nb * tile_batch - T
    tx0p = jnp.pad(tx0, (0, pad)).reshape(nb, tile_batch)
    ty0p = jnp.pad(ty0, (0, pad)).reshape(nb, tile_batch)
    idx, cnt, raw = jax.lax.map(lambda ab: bin_tile_batch(*ab), (tx0p, ty0p))
    idx = idx.reshape(nb * tile_batch, cap)[:T]
    cnt = cnt.reshape(-1)[:T]
    raw = raw.reshape(-1)[:T]
    return idx, cnt, raw, order


@functools.partial(
    jax.jit, static_argnames=("img_wh", "cap", "max_tiles_per_gauss")
)
def bin_gaussians_pairs(
    proj: Projected,
    img_wh: tuple[int, int],
    cap: int = 512,
    max_tiles_per_gauss: int = 32,
):
    """Pair-expansion binning: the XLA-native analog of GPU 3DGS's
    duplicate-and-radix-sort (one global stable sort instead of per-tile
    top-k — compiles and runs orders faster at many-tile scale).

    Each depth-sorted gaussian emits up to MT (tile_id, rank) pairs covering
    its bounding square's tile span (row-major within the span; spans larger
    than MT tiles are truncated — pick MT to cover the largest expected
    radius). A single 2-key sort groups pairs by tile with depth order
    preserved; positions within each tile come from searchsorted segment
    starts; a scatter fills the (T, CAP) index lists.

    Returns (gather_idx (T, CAP) into depth-sorted arrays, counts (T,),
    raw_counts (T,), order (G,)).
    """
    G = proj.depths.shape[0]
    MT = max_tiles_per_gauss
    tiles_x, tiles_y = num_tiles(img_wh)
    T = tiles_x * tiles_y

    key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(key, stable=True)
    mx = proj.means2d[order, 0]
    my = proj.means2d[order, 1]
    r = proj.radii[order]
    valid = proj.valid[order]

    # Tile span of each gaussian's bounding square (clamped to the grid).
    tx0 = jnp.clip(jnp.floor((mx - r) / TILE), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) / TILE), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / TILE), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) / TILE), 0, tiles_y - 1).astype(jnp.int32)
    gather_idx, counts, raw = _pairs_to_lists(
        tx0, tx1, ty0, ty1, mx, my, valid, G, T, tiles_x, tiles_y, MT, cap
    )
    return gather_idx, counts, raw, order


@functools.partial(
    jax.jit, static_argnames=("img_wh", "cap", "max_tiles_per_gauss")
)
def bin_gaussians_union(
    projs: Projected,  # arrays with a leading sub-frame axis (S, G, ...)
    img_wh: tuple[int, int],
    cap: int = 512,
    max_tiles_per_gauss: int = 32,
):
    """Shared binning for an exposure window: one sort for all S sub-frames.

    Uses the union of each gaussian's per-sub-frame bounding boxes, so the
    produced tile lists are a superset of every sub-frame's exact lists —
    and because compositing applies the per-pixel 3-sigma bounding-box
    cutoff (ops/rasterize.py), rendering with a superset list is exact.
    The shared depth order is each gaussian's front-most depth across the
    window (sub-frame depth orders can differ slightly within an exposure;
    see PARITY.md). Amortizes the dominant binning sort over K sub-frames.

    Returns (gather_idx (T, CAP) into sorted order, counts, raw, order).
    """
    S, G = projs.depths.shape
    MT = max_tiles_per_gauss
    tiles_x, tiles_y = num_tiles(img_wh)
    T = tiles_x * tiles_y

    valid_any = projs.valid.any(axis=0)
    inf = jnp.inf
    mx0 = jnp.min(jnp.where(projs.valid, projs.means2d[..., 0] - projs.radii, inf), 0)
    mx1 = jnp.max(jnp.where(projs.valid, projs.means2d[..., 0] + projs.radii, -inf), 0)
    my0 = jnp.min(jnp.where(projs.valid, projs.means2d[..., 1] - projs.radii, inf), 0)
    my1 = jnp.max(jnp.where(projs.valid, projs.means2d[..., 1] + projs.radii, -inf), 0)
    depth_key = jnp.min(jnp.where(projs.valid, projs.depths, inf), 0)

    key = jnp.where(valid_any, depth_key, jnp.inf)
    order = jnp.argsort(key, stable=True)
    x0 = mx0[order]
    x1 = mx1[order]
    y0 = my0[order]
    y1 = my1[order]
    valid = valid_any[order]

    tx0 = jnp.clip(jnp.floor(x0 / TILE), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(x1 / TILE), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(y0 / TILE), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(y1 / TILE), 0, tiles_y - 1).astype(jnp.int32)
    cx = 0.5 * (x0 + x1)
    cy = 0.5 * (y0 + y1)
    return _pairs_to_lists(
        tx0, tx1, ty0, ty1, cx, cy, valid, G, T, tiles_x, tiles_y, MT, cap
    ) + (order,)


def _pairs_to_runs(tx0, tx1, ty0, ty1, cx, cy, valid, G, T, tiles_x,
                   tiles_y, MT, cap):
    """Pair-expansion binning up to sorted runs.

    Returns (rank_sorted (E,), starts (T+1,), counts (T,), raw (T,)): tile
    t's depth-ordered gaussian list is rank_sorted[starts[t] :
    starts[t]+raw[t]] (entries are indices into the depth-sorted order).
    """
    w_span = tx1 - tx0 + 1
    h_span = ty1 - ty0 + 1
    w_eff = jnp.minimum(w_span, MT)
    h_eff = jnp.minimum(h_span, jnp.maximum(MT // jnp.maximum(w_eff, 1), 1))
    txc = jnp.clip((cx / TILE).astype(jnp.int32), 0, tiles_x - 1)
    tyc = jnp.clip((cy / TILE).astype(jnp.int32), 0, tiles_y - 1)
    tx0e = jnp.clip(txc - w_eff // 2, tx0, tx1 - w_eff + 1)
    ty0e = jnp.clip(tyc - h_eff // 2, ty0, ty1 - h_eff + 1)

    j = jnp.arange(MT, dtype=jnp.int32)[None, :]
    row = j // w_eff[:, None]
    col = j % w_eff[:, None]
    in_span = (j < (w_eff * h_eff)[:, None]) & valid[:, None]
    tile_id = jnp.where(
        in_span, (ty0e[:, None] + row) * tiles_x + (tx0e[:, None] + col), T
    )

    rank = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[:, None], (G, MT))
    tile_flat = tile_id.reshape(-1)
    rank_flat = rank.reshape(-1)
    # Fused single int32 key (tile major, depth-rank minor): one
    # payload-free sort instead of a 2-key lexicographic sort (the sort
    # dominates binning time at scale). The rank multiplier is the next
    # power of two so unpacking is a shift + mask, not int division
    # (divides by a non-power-of-2 cost several ms at pair scale).
    rank_bits = int(G).bit_length()
    if (T + 1) << rank_bits < 2**31:
        key = (tile_flat << rank_bits) | rank_flat
        key_sorted = jax.lax.sort(key)
        tile_sorted = key_sorted >> rank_bits
        rank_sorted = key_sorted & ((1 << rank_bits) - 1)
    else:
        tile_sorted, rank_sorted = jax.lax.sort(
            (tile_flat, rank_flat), num_keys=2
        )

    # The sort groups pairs by tile with depth order preserved, so tile t's
    # list is the contiguous run rank_sorted[starts[t] : starts[t]+raw[t]].
    starts = jnp.searchsorted(tile_sorted, jnp.arange(T + 1, dtype=jnp.int32))
    raw = (starts[1:] - starts[:-1])[:T].astype(jnp.int32)
    counts = jnp.minimum(raw, cap)
    return rank_sorted, tile_sorted, starts, counts, raw


def _pairs_to_lists(tx0, tx1, ty0, ty1, cx, cy, valid, G, T, tiles_x,
                    tiles_y, MT, cap):
    """Shared tail of pair-expansion binning: emit pairs, sort, scatter.

    Materializes the dense (T, CAP) lists with a scatter keyed by
    within-run position (running maximum of run-start indices). Callers
    that only need per-bucket lists should read them straight from the
    runs (bucket_tiles_from_runs) — a full-table gather/scatter at pair
    scale is the most expensive single op of a train step.
    """
    rank_sorted, tile_sorted, starts, counts, raw = _pairs_to_runs(
        tx0, tx1, ty0, ty1, cx, cy, valid, G, T, tiles_x, tiles_y, MT, cap
    )
    E = tile_sorted.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), tile_sorted[1:] != tile_sorted[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    pos = idx - run_start
    ok = (tile_sorted < T) & (pos < cap)
    scatter_tile = jnp.where(ok, tile_sorted, T)
    scatter_pos = jnp.where(ok, pos, 0)
    gather_idx = jnp.full((T + 1, cap), G, jnp.int32)
    gather_idx = gather_idx.at[scatter_tile, scatter_pos].set(
        rank_sorted, mode="drop"
    )[:T]
    return gather_idx, counts, raw


class TileBuckets(NamedTuple):
    """Count-sorted tile buckets for the exposure-shared compositor.

    Tiles sorted by occupancy get rank-dependent capacities: the dense
    (T, F, CAP) layout wastes ~5x slots when the mean per-tile count is far
    below CAP (bench: 210 vs 1024), and TPU row-gathers / kernel DMA pay
    per-slot whether or not the slot is a sentinel. Bucketing the top
    occupancy ranks at full capacity and the tail at small capacity cuts
    pack-gather, gradient-scatter, and kernel DMA traffic ~3x with the same
    front-most-kept truncation policy as the uniform-CAP layout.
    """

    tile_ids: tuple  # per bucket: (Tb_pad,) int32 image-tile ids
    counts: tuple  # per bucket: (Tb_pad,) int32 capped counts
    gather_idx: tuple  # per bucket: (Tb_pad, cap_b) into sorted arrays
    caps: tuple  # per bucket: int capacity
    sizes: tuple  # per bucket: int unpadded tile count (sum == T)


# Rank fractions and capacity fractions for default_bucket_spec: the top
# 1/8 of tiles by occupancy get the full configured capacity, the next 1/8
# half, the next 1/4 a quarter, and the tail 1/8 (clamped to one CHUNK).
BUCKET_FRACS = ((0.125, 1.0), (0.125, 0.5), (0.25, 0.25), (0.5, 0.125))
MIN_CAP = 128  # == rasterize.CHUNK; capacities must be CHUNK multiples


def default_bucket_spec(T: int, cap: int):
    """Static (n_tiles, cap) bucket spec for T tiles at base capacity cap.

    Sizes sum to exactly T; capacities are CHUNK multiples in [MIN_CAP, cap]
    and non-increasing. Degenerates to a single bucket when T or cap is
    small (e.g. unit-test images).
    """
    spec = []
    left = T
    for i, (ft, fc) in enumerate(BUCKET_FRACS):
        if i == len(BUCKET_FRACS) - 1:
            n = left
        else:
            n = min(left, max(1, round(T * ft)))
        c = min(cap, max(MIN_CAP, int(round(cap * fc / MIN_CAP)) * MIN_CAP))
        if n > 0:
            if spec and spec[-1][1] == c:
                spec[-1] = (spec[-1][0] + n, c)  # merge equal-cap buckets
            else:
                spec.append((n, c))
        left -= n
    return tuple(spec)


def bucket_tiles(
    gather_idx: jnp.ndarray,  # (T, CAP) from bin_gaussians_union
    counts: jnp.ndarray,  # (T,)
    raw_counts: jnp.ndarray,  # (T,) pre-cap occupancy (sort key)
    G: int,
    spec,  # ((n_tiles, cap), ...) static, sizes summing to T
) -> TileBuckets:
    """Split tiles into occupancy-rank buckets with per-bucket capacity.

    Each bucket's gather lists are the front-most cap_b entries of the full
    lists (depth order preserved), padded to a TILE_BLOCK multiple with
    sentinel rows (tile id 0, count 0 — dropped on combine).
    """
    order_t = jnp.argsort(-raw_counts).astype(jnp.int32)
    ids_l, cnt_l, gi_l, caps, sizes = [], [], [], [], []
    start = 0
    for n, c in spec:
        ids = jax.lax.slice_in_dim(order_t, start, start + n)
        start += n
        Tb = pad_tiles(n)
        pad = Tb - n
        gi = gather_idx[ids, :c]
        cnt = jnp.minimum(counts[ids], c)
        if pad:
            ids = jnp.concatenate([ids, jnp.zeros((pad,), jnp.int32)])
            cnt = jnp.concatenate([cnt, jnp.zeros((pad,), jnp.int32)])
            gi = jnp.concatenate([gi, jnp.full((pad, c), G, jnp.int32)])
        ids_l.append(ids)
        cnt_l.append(cnt)
        gi_l.append(gi)
        caps.append(c)
        sizes.append(n)
    return TileBuckets(
        tuple(ids_l), tuple(cnt_l), tuple(gi_l), tuple(caps), tuple(sizes)
    )


@functools.partial(
    jax.jit, static_argnames=("img_wh", "cap", "max_tiles_per_gauss")
)
def bin_gaussians_union_runs(
    projs: Projected,  # arrays with a leading sub-frame axis (S, G, ...)
    img_wh: tuple[int, int],
    cap: int = 512,
    max_tiles_per_gauss: int = 32,
):
    """bin_gaussians_union without materializing the dense (T, CAP) table.

    Returns (rank_sorted, starts, counts, raw, order); feed to
    bucket_tiles_from_runs. The dense table costs a pair-scale scatter
    (the most expensive op of a train step) that the bucketed compositor
    path never needs.
    """
    S, G = projs.depths.shape
    MT = max_tiles_per_gauss
    tiles_x, tiles_y = num_tiles(img_wh)
    T = tiles_x * tiles_y

    valid_any = projs.valid.any(axis=0)
    inf = jnp.inf
    mx0 = jnp.min(jnp.where(projs.valid, projs.means2d[..., 0] - projs.radii, inf), 0)
    mx1 = jnp.max(jnp.where(projs.valid, projs.means2d[..., 0] + projs.radii, -inf), 0)
    my0 = jnp.min(jnp.where(projs.valid, projs.means2d[..., 1] - projs.radii, inf), 0)
    my1 = jnp.max(jnp.where(projs.valid, projs.means2d[..., 1] + projs.radii, -inf), 0)
    depth_key = jnp.min(jnp.where(projs.valid, projs.depths, inf), 0)

    key = jnp.where(valid_any, depth_key, jnp.inf)
    order = jnp.argsort(key, stable=True)
    x0 = mx0[order]
    x1 = mx1[order]
    y0 = my0[order]
    y1 = my1[order]
    valid = valid_any[order]

    tx0 = jnp.clip(jnp.floor(x0 / TILE), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(x1 / TILE), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(y0 / TILE), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(y1 / TILE), 0, tiles_y - 1).astype(jnp.int32)
    cx = 0.5 * (x0 + x1)
    cy = 0.5 * (y0 + y1)
    rank_sorted, _, starts, counts, raw = _pairs_to_runs(
        tx0, tx1, ty0, ty1, cx, cy, valid, G, T, tiles_x, tiles_y, MT, cap
    )
    return rank_sorted, starts, counts, raw, order


def bucket_tiles_from_runs(
    rank_sorted: jnp.ndarray,  # (E,)
    starts: jnp.ndarray,  # (T+1,)
    raw_counts: jnp.ndarray,  # (T,)
    G: int,
    spec,  # ((n_tiles, cap), ...) static, sizes summing to T
    pad_multiple: int = TILE_BLOCK,  # n_devices*TILE_BLOCK when tile-sharded
) -> TileBuckets:
    """bucket_tiles reading each bucket's lists straight from sorted runs.

    Replaces [dense (T, CAP) scatter + per-bucket row gather] with one
    (Tb, cap_b) gather per bucket at its own capacity — ~3x fewer gathered
    slots and no pair-scale scatter.
    """
    T = raw_counts.shape[0]
    E = rank_sorted.shape[0]
    order_t = jnp.argsort(-raw_counts).astype(jnp.int32)
    ids_l, cnt_l, gi_l, caps, sizes = [], [], [], [], []
    start = 0
    for n, c in spec:
        ids = jax.lax.slice_in_dim(order_t, start, start + n)
        start += n
        Tb = pad_tiles(n, pad_multiple)
        pad = Tb - n
        lane = jnp.arange(c, dtype=jnp.int32)[None, :]
        src = jnp.minimum(starts[ids][:, None] + lane, E - 1)
        gi = jnp.where(lane < raw_counts[ids][:, None], rank_sorted[src], G)
        cnt = jnp.minimum(raw_counts[ids], c)
        if pad:
            ids = jnp.concatenate([ids, jnp.zeros((pad,), jnp.int32)])
            cnt = jnp.concatenate([cnt, jnp.zeros((pad,), jnp.int32)])
            gi = jnp.concatenate([gi, jnp.full((pad, c), G, jnp.int32)])
        ids_l.append(ids)
        cnt_l.append(cnt)
        gi_l.append(gi)
        caps.append(c)
        sizes.append(n)
    return TileBuckets(
        tuple(ids_l), tuple(cnt_l), tuple(gi_l), tuple(caps), tuple(sizes)
    )


def _pad_lists(gather_idx, counts, raw, G):
    """Pad tile rows to a TILE_BLOCK multiple (sentinel entries)."""
    T = gather_idx.shape[0]
    Tp = pad_tiles(T)
    if Tp == T:
        return gather_idx, counts, raw
    return (
        jnp.concatenate(
            [gather_idx, jnp.full((Tp - T, gather_idx.shape[1]), G, jnp.int32)]
        ),
        jnp.concatenate([counts, jnp.zeros((Tp - T,), jnp.int32)]),
        jnp.concatenate([raw, jnp.zeros((Tp - T,), jnp.int32)]),
    )


def pack_with_binning(
    proj: Projected,
    opacities: jnp.ndarray,
    channels: jnp.ndarray,
    gather_idx: jnp.ndarray,  # (T or Tp, CAP) into `order`-sorted arrays
    counts: jnp.ndarray,
    raw_counts: jnp.ndarray,
    order: jnp.ndarray,
    tiles_xy: tuple[int, int],
) -> TileBinning:
    """Gather one sub-frame's packed params through precomputed (shared)
    tile lists."""
    G = proj.depths.shape[0]
    gather_idx, counts, raw_counts = _pad_lists(
        gather_idx, counts, raw_counts, G
    )
    packed = jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            opacities[:, None],
            proj.radii[:, None],
            channels,
        ],
        axis=-1,
    )[order]
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[-1]), packed.dtype)], axis=0
    )
    tile_data = jnp.swapaxes(packed[gather_idx], -1, -2)
    return TileBinning(tile_data, counts, gather_idx, order, raw_counts, tiles_xy)


# Split layout for the exposure-shared path: rows that change per sub-frame
# vs rows shared across the window (gathered once).
#   dyn rows:    [mx, my, conic_a, conic_b, conic_c, radius, (depth)]
#   static rows: [opacity, channel_0 .. channel_{Dc-1}]
DYN_ROWS = 6


def packed_static_table(
    opacities: jnp.ndarray,  # (G,)
    const_channels: jnp.ndarray,  # (G, Dc)
    order: jnp.ndarray,
) -> jnp.ndarray:
    """(G+1, 1+Dc) depth-sorted static rows + zero sentinel row."""
    packed = jnp.concatenate(
        [opacities[:, None], const_channels], axis=-1
    )[order]
    return jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[-1]), packed.dtype)], axis=0
    )


def pack_static(
    opacities: jnp.ndarray,  # (G,)
    const_channels: jnp.ndarray,  # (G, Dc) sub-frame-independent payload
    gather_idx: jnp.ndarray,
    order: jnp.ndarray,
    packed: jnp.ndarray | None = None,  # precomputed packed_static_table
) -> jnp.ndarray:
    """(Tp, 1 + Dc, CAP): gathered once per exposure window."""
    G = opacities.shape[0]
    gather_idx, _, _ = _pad_lists(
        gather_idx, jnp.zeros((gather_idx.shape[0],), jnp.int32),
        jnp.zeros((gather_idx.shape[0],), jnp.int32), G,
    )
    if packed is None:
        packed = packed_static_table(opacities, const_channels, order)
    return jnp.swapaxes(packed[gather_idx], -1, -2)


def pack_dyn(
    proj: Projected,
    gather_idx: jnp.ndarray,
    order: jnp.ndarray,
    include_depth: bool,
) -> jnp.ndarray:
    """(Tp, 6(+1), CAP): per-sub-frame screen-space rows."""
    G = proj.depths.shape[0]
    gather_idx, _, _ = _pad_lists(
        gather_idx, jnp.zeros((gather_idx.shape[0],), jnp.int32),
        jnp.zeros((gather_idx.shape[0],), jnp.int32), G,
    )
    rows = [proj.means2d, proj.conics, proj.radii[:, None]]
    if include_depth:
        rows.append(proj.depths[:, None])
    packed = jnp.concatenate(rows, axis=-1)[order]
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[-1]), packed.dtype)], axis=0
    )
    return jnp.swapaxes(packed[gather_idx], -1, -2)


def packed_dyn_table(
    projs: Projected,  # arrays with leading sub-frame axis (S, G, ...)
    order: jnp.ndarray,
    include_depth: bool,
) -> jnp.ndarray:
    """(G+1, S*Fd) depth-sorted per-sub-frame screen rows + sentinel row."""
    S, G = projs.depths.shape
    rows = [projs.means2d, projs.conics, projs.radii[..., None]]
    if include_depth:
        rows.append(projs.depths[..., None])
    packed = jnp.concatenate(rows, axis=-1)  # (S, G, Fd)
    Fd = packed.shape[-1]
    packed = jnp.swapaxes(packed, 0, 1).reshape(G, S * Fd)[order]
    return jnp.concatenate(
        [packed, jnp.zeros((1, S * Fd), packed.dtype)], axis=0
    )


def pack_dyn_all(
    projs: Projected,  # arrays with leading sub-frame axis (S, G, ...)
    gather_idx: jnp.ndarray,
    order: jnp.ndarray,
    include_depth: bool,
    packed: jnp.ndarray | None = None,  # precomputed packed_dyn_table
) -> jnp.ndarray:
    """(S, Tp, 6(+1), CAP): every sub-frame's screen rows in ONE gather.

    The exposure-shared tile lists (bin_gaussians_union) use identical
    gather indices for all S sub-frames, so gathering a (G, S*Fd) packed
    array once moves S*Fd*4 bytes per random row access instead of issuing
    S separate narrow gathers — random-access index overhead is paid once
    per gaussian-slot rather than once per sub-frame.
    """
    S, G = projs.depths.shape
    Tp = gather_idx.shape[0]
    cap = gather_idx.shape[1]
    gather_idx, _, _ = _pad_lists(
        gather_idx, jnp.zeros((Tp,), jnp.int32), jnp.zeros((Tp,), jnp.int32), G
    )
    Tp = gather_idx.shape[0]
    if packed is None:
        packed = packed_dyn_table(projs, order, include_depth)
    Fd = packed.shape[-1] // S
    out = packed[gather_idx]  # (Tp, CAP, S*Fd)
    return out.reshape(Tp, cap, S, Fd).transpose(2, 0, 3, 1)


def pack_dyn_fused(
    projs: Projected,  # arrays with leading sub-frame axis (S, G, ...)
    gather_idx: jnp.ndarray,
    order: jnp.ndarray,
    include_depth: bool,
    packed: jnp.ndarray | None = None,  # precomputed packed_dyn_table
) -> jnp.ndarray:
    """(Tp, S, 6(+1), CAP): pack_dyn_all in the fused-window kernel layout.

    Same single wide gather; the sub-frame axis lands *inside* the tile axis
    so the fused compositor kernel (rasterize.composite_tiles_window) can
    stream one (S, Fd, cap) block per tile.
    """
    S, G = projs.depths.shape
    Tp = gather_idx.shape[0]
    cap = gather_idx.shape[1]
    gather_idx, _, _ = _pad_lists(
        gather_idx, jnp.zeros((Tp,), jnp.int32), jnp.zeros((Tp,), jnp.int32), G
    )
    Tp = gather_idx.shape[0]
    if packed is None:
        packed = packed_dyn_table(projs, order, include_depth)
    Fd = packed.shape[-1] // S
    out = packed[gather_idx]  # (Tp, CAP, S*Fd)
    return out.reshape(Tp, cap, S, Fd).transpose(0, 2, 3, 1)


def pack_window_fused(
    gather_idx: jnp.ndarray,  # (Tb, cap_b) one bucket's tile lists
    table: jnp.ndarray,  # (G+1, S*Fd + 1 + Dc) combined dyn+static table
    S: int,
    Fd: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ONE row gather per bucket -> (dyn (Tb, S, Fd, cap), st (Tb, Fs, cap)).

    The dyn and static payload tables are concatenated so each bucket costs
    a single row gather in the forward and a single scatter-add in the
    backward — separate narrow gathers (especially the 1+Dc-lane static
    one) pay per-slot random-access overhead twice.
    """
    G = table.shape[0] - 1
    gather_idx, _, _ = _pad_lists(
        gather_idx, jnp.zeros((gather_idx.shape[0],), jnp.int32),
        jnp.zeros((gather_idx.shape[0],), jnp.int32), G,
    )
    Tp, cap = gather_idx.shape
    out = table[gather_idx]  # (Tp, cap, S*Fd + Fs)
    dyn = out[..., : S * Fd].reshape(Tp, cap, S, Fd).transpose(0, 2, 3, 1)
    st = jnp.swapaxes(out[..., S * Fd :], -1, -2)
    return dyn, st


def pack_and_gather(
    proj: Projected,
    opacities: jnp.ndarray,  # (G,)
    channels: jnp.ndarray,  # (G, D)
    img_wh: tuple[int, int],
    cap: int = 512,
) -> TileBinning:
    """Full binning: sort, bin, and gather packed params to (T, F, CAP).

    The gather (and therefore its transpose-scatter in the backward pass) is
    a plain XLA gather over a (G+1, F) packed array with a zero sentinel
    row, so autodiff of everything outside the Pallas compositor is
    automatic.
    """
    gather_idx, counts, raw_counts, order = bin_gaussians_pairs(
        proj, img_wh, cap
    )
    return pack_with_binning(
        proj, opacities, channels, gather_idx, counts, raw_counts, order,
        num_tiles(img_wh),
    )
