"""Mesh reconstruction from the implicit map.

Parity target: reference ``Mesher`` (utils/mesher.py:14-368): chunked
no-grad SDF inference with the marching-cubes visibility mask, dense
bounding-box reconstruction, octree-tiled reconstruction at a chosen query
level, SDF-map export (sdf in the intensity channel), vertex semantics, and
isolated-cluster filtering.

TPU-first: inference batches are padded to one static ``infer_bs`` shape so
a single jitted query/decoder executable serves the whole reconstruction.
"""

from __future__ import annotations

import functools
import math
import os
import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import SHINEConfig
from .data import io
from .models import decoder
from .ops.marching import marching_tetrahedra, vertex_normals
from .ops.query import query_feature_with_aux
from .data.semantic_kitti import labels_to_colors


def _mesh_stamp(tag: str, t0):
    """Opt-in reconstruction stage timing (SHINE_TIME_MESH=1)."""
    if os.environ.get("SHINE_TIME_MESH", "0") == "1" and t0 is not None:
        print(f"[mesh] {tag}: {time.perf_counter() - t0:.2f}s", flush=True)
    return time.perf_counter()


def _infer_core(
    geo_params,
    sem_params,
    features,
    tables,
    coords,
    ts,
    levels: Tuple[int, ...],
    poly_on: bool,
    check_level: int,
    time_conditioned: bool,
    with_sem: bool,
):
    feat, corners, found = query_feature_with_aux(
        coords, tables, list(features), levels, poly_on
    )
    if time_conditioned:
        sdf = -decoder.time_conditioned_sdf(geo_params, feat, ts)
    else:
        sdf = -decoder.sdf(geo_params, feat)  # sign flip: utils/mesher.py:72
    # mc mask: node found at the checked level (all 8 corners valid,
    # utils/mesher.py:80-89)
    mask = found[check_level]
    # zero-size when semantics are off: a full-size int32 zeros output
    # costs 4 B/query of HBM across the stacked lax.map outputs (~800 MB
    # on a 200M-query reconstruction)
    sem = (
        decoder.sem_label(sem_params, feat)
        if with_sem
        else jnp.zeros((0,), jnp.int32)
    )
    return sdf, sem, mask


@functools.partial(jax.jit, static_argnames=("levels", "poly_on", "check_level", "time_conditioned", "with_sem"))
def _infer_chunk(
    geo_params, sem_params, features, tables, coords, ts,
    levels: Tuple[int, ...], poly_on: bool, check_level: int,
    time_conditioned: bool, with_sem: bool,
):
    return _infer_core(geo_params, sem_params, features, tables, coords, ts,
                       levels, poly_on, check_level, time_conditioned,
                       with_sem)


@functools.partial(jax.jit, static_argnames=("levels", "poly_on", "check_level", "time_conditioned", "with_sem"))
def _infer_chunks(
    geo_params, sem_params, features, tables, coords_chunks, ts_value,
    levels: Tuple[int, ...], poly_on: bool, check_level: int,
    time_conditioned: bool, with_sem: bool,
):
    """lax.map twin of ``_infer_chunk`` over a (K, bs, 3) chunk stack.

    ONE dispatch + ONE readback for the whole query grid: the per-chunk
    host round trips of a Python loop dominate reconstruction wall-clock
    through the axon tunnel (measured 136 s of a 418 s ICRA-scale demo
    run; see BENCH_NOTES).  Chunks run sequentially on device, so peak
    memory matches the per-chunk path."""

    def one(chunk):
        ts = jnp.full((chunk.shape[0],), ts_value, jnp.float32)
        return _infer_core(geo_params, sem_params, features, tables, chunk,
                           ts, levels, poly_on, check_level,
                           time_conditioned, with_sem)

    return jax.lax.map(one, coords_chunks)


@functools.partial(jax.jit, static_argnames=(
    "K", "bs", "levels", "poly_on", "check_level", "time_conditioned",
    "with_sem"))
def _infer_chunks_grid(
    geo_params, sem_params, features, tables, origin_s, steps_s, nynz, nz,
    ts_value, K: int, bs: int, levels: Tuple[int, ...], poly_on: bool,
    check_level: int, time_conditioned: bool, with_sem: bool,
):
    """Dense-grid twin of ``_infer_chunks`` that GENERATES the query
    coordinates on device (flat index -> (ix, iy, iz) -> scaled coords)
    instead of uploading a host-built (N, 3) array — the host-side
    meshgrid/stack alone cost ~40 s for a 9M-point grid on this machine
    (slow numpy host).  ``origin_s``/``steps_s`` are the scaled-space
    grid origin and per-axis voxel step; ``nynz``/``nz`` traced divmod
    constants so grids of any shape share one executable per (K, bs)."""

    def one(k):
        idx = k * bs + jax.lax.iota(jnp.int32, bs)
        ix = idx // nynz
        rem = idx % nynz
        iy = rem // nz
        iz = rem % nz
        ijk = jnp.stack([ix, iy, iz], axis=1).astype(jnp.float32)
        coord = ijk * steps_s[None, :] + origin_s[None, :]
        ts = jnp.full((bs,), ts_value, jnp.float32)
        return _infer_core(geo_params, sem_params, features, tables, coord,
                           ts, levels, poly_on, check_level,
                           time_conditioned, with_sem)

    return jax.lax.map(one, jnp.arange(K, dtype=jnp.int32))


def _lattice_core(features, tables, coord, origins_k, npb: int, block: int,
                  levels, n_list, poly_on: bool):
    """Shared lattice inference: interpolated features for ``coord``
    (npb*block, 3) where each of the ``npb`` blocks' points lie within a
    small static node lattice anchored at the block's first point.

    Per level ``i`` the lattice is ``n_list[i]`` cells per axis starting at
    ``quantize(origins_k, level)``; callers guarantee every block point's
    cell falls inside it (node-aligned blocks: exact nesting; index-space
    blocks: n = floor(extent/cell) + 2).  Probes and corner gathers happen
    per LATTICE CELL (not per point); points select their cell's corner
    features with an exact one-hot f32 MXU matmul (one nonzero per row).
    Returns (feat (npb*block, D), found-per-point list per level).

    Parity: the reference's chunked query_points + get_indices_fast
    semantics (utils/mesher.py:33-108, model/feature_octree.py:267-286 —
    its voxel-dedup dict lookup is the host-side ancestor of this
    lattice) with identical node assignment via quantize_points.
    """
    from .ops.hashgrid import lookup_level_cells
    from .ops.interp import corner_weights
    from .ops.morton import quantize_points

    feat_dims = tuple(f.shape[1] for f in features)
    feat = None
    found_pts = []
    for i, lvl in enumerate(levels):
        n = n_list[i]
        n3 = n ** 3
        # lattice cells: the block origin's cell + the static offsets
        q0 = quantize_points(origins_k, lvl).astype(jnp.int32)  # (npb, 3)
        lat = jax.lax.iota(jnp.int32, n3)
        lat_off = jnp.stack(
            [lat // (n * n), (lat // n) % n, lat % n], axis=1)
        cells = (q0[:, None, :] + lat_off[None, :, :]).astype(jnp.uint32)
        corners, found_l = lookup_level_cells(tables[i], cells)
        F = features[i][corners]  # (npb, n3, 8, D) — tiny gather
        # point -> lattice index via the SAME quantization as the
        # direct path (exact node-assignment parity)
        qp = quantize_points(coord, lvl).astype(jnp.int32)
        a = qp.reshape(npb, block, 3) - q0[:, None, :]
        inrange = jnp.all((a >= 0) & (a < n), axis=-1)
        flat = (a[..., 0] * n + a[..., 1]) * n + a[..., 2]
        flat = jnp.clip(flat, 0, n3 - 1)
        onehot = (flat[:, :, None] == lat[None, None, :]).astype(
            jnp.float32)  # (npb, block, n3)
        # exact selection on the MXU: one nonzero per onehot row.  The
        # one-hot operand is exact in bf16, but TPU's DEFAULT f32 dot
        # rounds BOTH operands to bf16 — quantizing the selected features
        # ~2^-9 relative vs the per-point path.  HIGHEST on the feature
        # operand (3-term bf16 decomposition) restores bit-exact selection;
        # the 0/1 operand stays single-pass.
        Fx = jnp.einsum(
            "bpn,bnx->bpx", onehot, F.reshape(npb, n3, 8 * feat_dims[i]),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
        ).reshape(npb, block, 8, feat_dims[i])
        found_p = (
            jnp.einsum("bpn,bn->bp", onehot,
                       found_l.astype(jnp.float32)) > 0.5
        ) & inrange
        w8 = corner_weights(coord, lvl, poly_on).reshape(npb, block, 8)
        w8 = jnp.where(found_p[..., None], w8, 0.0)
        fi = jnp.einsum("bpc,bpcd->bpd", w8, Fx)
        feat = fi if feat is None else feat + fi
        found_pts.append(found_p.reshape(-1))
    return feat.reshape(npb * block, -1), found_pts


def _decode_lattice(geo_params, sem_params, feat, found_pts, n_pts: int,
                    ts_value, check_level: int, time_conditioned: bool,
                    with_sem: bool):
    ts = jnp.full((n_pts,), ts_value, jnp.float32)
    if time_conditioned:
        sdf = -decoder.time_conditioned_sdf(geo_params, feat, ts)
    else:
        sdf = -decoder.sdf(geo_params, feat)
    mask = found_pts[check_level]
    sem = (
        decoder.sem_label(sem_params, feat)
        if with_sem
        else jnp.zeros((0,), jnp.int32)  # see _infer_core
    )
    return sdf, sem, mask


@functools.partial(jax.jit, static_argnames=(
    "K", "npb", "vb", "n_list", "levels", "poly_on", "check_level",
    "time_conditioned", "with_sem"))
def _infer_grid_blocks_lattice(
    geo_params, sem_params, features, tables, origin_s, step, nby, nbz,
    ts_value, K: int, npb: int, vb: int, n_list: Tuple[int, ...],
    levels: Tuple[int, ...], poly_on: bool, check_level: int,
    time_conditioned: bool, with_sem: bool,
):
    """Dense-grid twin of ``_infer_node_blocks_lattice``: the (nx, ny, nz)
    voxel grid is cut into index-space blocks of vb^3 voxels (the grid is
    NOT node-aligned, so ``n_list`` carries per-level lattice sizes
    floor(extent/cell) + 2 computed host-side from the voxel step).
    Output is BLOCK-major: (K, npb*vb^3); the caller reassembles the 3D
    grid with one transpose."""
    block = vb ** 3

    def one(k):
        bi = k * npb + jax.lax.iota(jnp.int32, npb)
        bx = bi // (nby * nbz)
        rem = bi % (nby * nbz)
        byz = jnp.stack([bx, rem // nbz, rem % nbz], axis=1)
        origins_k = origin_s[None, :] + byz.astype(jnp.float32) * (vb * step)
        idx = jax.lax.iota(jnp.int32, npb * block)
        node = idx // block
        w_ = idx % block
        ix = w_ // (vb * vb)
        rem2 = w_ % (vb * vb)
        off = jnp.stack([ix, rem2 // vb, rem2 % vb], axis=1)
        coord = origins_k[node] + off.astype(jnp.float32) * step
        feat, found_pts = _lattice_core(
            features, tables, coord, origins_k, npb, block, levels,
            n_list, poly_on)
        return _decode_lattice(
            geo_params, sem_params, feat, found_pts, npb * block, ts_value,
            check_level, time_conditioned, with_sem)

    return jax.lax.map(one, jnp.arange(K, dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "K", "npb", "vpn", "query_level", "levels", "poly_on", "check_level",
    "time_conditioned", "with_sem"))
def _infer_node_blocks_lattice(
    geo_params, sem_params, features, tables, origins_chunks, step,
    ts_value, K: int, npb: int, vpn: int, query_level: int,
    levels: Tuple[int, ...], poly_on: bool, check_level: int,
    time_conditioned: bool, with_sem: bool,
):
    """Node-lattice twin of ``_infer_node_blocks`` — the speed-of-light
    formulation of octree-tiled SDF inference.

    The direct path pays one hash probe + 8 corner-row gathers PER POINT
    per level (~90 ms per 131k-point chunk; gathers are row-count-bound,
    BENCH_NOTES round 3).  But a query block is one ``query_level`` node,
    and the finer levels nest exactly inside it: level ``l`` contributes a
    static ``n = 2^(l - query_level)`` per-axis lattice of nodes (n = 1
    for coarser levels).  So per block it suffices to look up the n^3
    LATTICE cells (73 probes per block instead of 3 x 4096) and gather
    THEIR corner rows; each point then selects its node's 8 corner
    features with an exact one-hot f32 matmul on the MXU (one nonzero per
    row -> bit-exact selection) and interpolates as usual.  Point->cell
    indices come from the same ``quantize_points`` as the direct path, so
    node assignment (and therefore the result) is identical.
    """
    from .ops.hashgrid import lookup_level_cells
    block = vpn ** 3
    n_list = tuple(1 << max(0, lvl - query_level) for lvl in levels)

    def one(origins_k):  # (npb, 3) scaled-space block origins
        idx = jax.lax.iota(jnp.int32, npb * block)
        node = idx // block
        w_ = idx % block
        ix = w_ // (vpn * vpn)
        rem = w_ % (vpn * vpn)
        off = jnp.stack([ix, rem // vpn, rem % vpn], axis=1)
        coord = origins_k[node] + off.astype(jnp.float32) * step
        feat, found_pts = _lattice_core(
            features, tables, coord, origins_k, npb, block, levels,
            n_list, poly_on)
        return _decode_lattice(
            geo_params, sem_params, feat, found_pts, npb * block, ts_value,
            check_level, time_conditioned, with_sem)

    return jax.lax.map(one, origins_chunks)


@functools.partial(jax.jit, static_argnames=(
    "K", "npb", "vpn", "levels", "poly_on", "check_level",
    "time_conditioned", "with_sem"))
def _infer_node_blocks(
    geo_params, sem_params, features, tables, origins_chunks, step,
    ts_value, K: int, npb: int, vpn: int, levels: Tuple[int, ...],
    poly_on: bool, check_level: int, time_conditioned: bool, with_sem: bool,
):
    """Octree-tiled twin of ``_infer_chunks_grid``: each lax.map step
    covers ``npb`` whole node blocks of vpn^3 voxels, generating the block
    coordinates on device from the node origins — the whole tiled
    reconstruction is ONE dispatch + ONE readback."""
    block = vpn ** 3

    def one(origins_k):  # (npb, 3) scaled-space block origins
        idx = jax.lax.iota(jnp.int32, npb * block)
        node = idx // block
        w = idx % block
        ix = w // (vpn * vpn)
        rem = w % (vpn * vpn)
        off = jnp.stack([ix, rem // vpn, rem % vpn], axis=1)
        coord = origins_k[node] + off.astype(jnp.float32) * step
        ts = jnp.full((npb * block,), ts_value, jnp.float32)
        return _infer_core(geo_params, sem_params, features, tables, coord,
                           ts, levels, poly_on, check_level,
                           time_conditioned, with_sem)

    return jax.lax.map(one, origins_chunks)


def _bucket_chunks(k: int) -> int:
    """Round the chunk count up so distinct stack shapes stay few (one
    compiled executable per bucket; <= 12.5% padded compute)."""
    if k <= 8:
        return k
    step = 1 << (k.bit_length() - 4) if k.bit_length() > 4 else 1
    return (k + step - 1) // step * step


class Mesher:
    def __init__(self, config: SHINEConfig, grid, geo_params, sem_params=None,
                 dp_mesh=None):
        self.config = config
        self.grid = grid  # HashGridHost
        self.geo_params = geo_params
        self.sem_params = sem_params
        self.world_scale = config.scale
        self.ts = 0  # query timestamp for time-conditioned maps
        self.global_transform = np.eye(4)
        # optional jax.sharding.Mesh: shard each inference batch over the
        # ``data`` axis (tables/features/decoders replicated) so meshing
        # scales across chips like training does.  The reference meshes on
        # the single training GPU (utils/mesher.py:33-108); the octree tiles
        # here are embarrassingly parallel.  Single-controller only — in
        # multi-host runs meshing stays process-local.
        self.dp_mesh = dp_mesh
        self._placed_key = None
        self._placed = None  # mesh-replicated (tables, features)

    def _mesh_sharded_inputs(self, tables, feats):
        """Replicate grid state on the dp_mesh (cached per features build)."""
        from .parallel.mesh import batch_sharded, replicated

        repl = replicated(self.dp_mesh)
        # version covers structure mutations (update() bumps it on every
        # table write); object ids cover feature re-syncs from training
        key = (
            self.grid.structure_version,
            tuple(id(t.keys) for t in tables),
            tuple(id(f) for f in feats),
        )
        if self._placed_key != key:
            self._placed = (
                jax.device_put(tables, repl),
                jax.device_put(feats, repl),
            )
            self._placed_key = key
        tables, feats = self._placed
        return tables, feats, batch_sharded(self.dp_mesh), repl

    # ------------------------------------------------------------------ queries
    def query_points(
        self,
        coords: np.ndarray,
        bs: int,
        query_sdf: bool = True,
        query_sem: bool = False,
        query_mask: bool = True,
    ):
        """Batched SDF / semantics / mask inference (utils/mesher.py:33-108).

        coords are in the scaled [-1,1] system; returns numpy arrays.
        """
        n = coords.shape[0]
        check_level = min(self.grid.featured_level_num, self.config.mc_vis_level) - 1
        iters = _bucket_chunks(math.ceil(n / bs))
        tables = tuple(self.grid.tables)
        feats = tuple(self.grid.features)
        geo_params, sem_params = self.geo_params, self.sem_params
        stack_sh = None
        if self.dp_mesh is not None and bs % self.dp_mesh.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            tables, feats, _, repl = self._mesh_sharded_inputs(tables, feats)
            geo_params = jax.device_put(geo_params, repl)
            if sem_params is not None:
                sem_params = jax.device_put(sem_params, repl)
            # chunk axis sequential (lax.map), batch axis over the chips
            stack_sh = NamedSharding(self.dp_mesh, P(None, "data"))

        # one padded (K, bs, 3) upload, one lax.map dispatch, one readback
        # per output — no per-chunk host round trips (_infer_chunks)
        stacked = np.zeros((iters * bs, 3), np.float32)
        stacked[:n] = coords
        stacked = stacked.reshape(iters, bs, 3)
        dev_stack = jnp.asarray(stacked)
        if stack_sh is not None:
            dev_stack = jax.device_put(dev_stack, stack_sh)
        sdf, sem, mask = _infer_chunks(
            geo_params,
            sem_params if query_sem else geo_params,
            feats,
            tables,
            dev_stack,
            jnp.float32(self.ts),
            tuple(self.grid.levels),
            self.grid.polynomial_interpolation,
            check_level,
            self.config.time_conditioned,
            query_sem,
        )
        sdf_out = (
            np.asarray(sdf).reshape(-1)[:n].astype(np.float64)
            if query_sdf else None
        )
        sem_out = (
            np.asarray(sem).reshape(-1)[:n].astype(np.int64)
            if query_sem else None
        )
        mask_out = (
            np.asarray(mask).reshape(-1)[:n] if query_mask else None
        )
        return sdf_out, sem_out, mask_out

    def query_grid(self, voxel_num_xyz, voxel_origin, voxel_size: float,
                   query_sdf: bool = True, query_sem: bool = False,
                   query_mask: bool = True):
        """Dense-grid inference with DEVICE-side coordinate generation.

        Equivalent to ``get_query_from_bbx`` + ``query_points`` but never
        materializes the (N, 3) grid on the host (host-side grid
        construction measured ~40 s for 9M points on this machine) nor
        uploads it.  Single-controller path; callers needing the host
        coords (sdf-map export) or dp_mesh sharding use the explicit pair.
        """
        n = int(np.prod(voxel_num_xyz))
        bs = self.config.infer_bs
        K = _bucket_chunks(math.ceil(n / bs))
        check_level = min(self.grid.featured_level_num,
                          self.config.mc_vis_level) - 1
        step = voxel_size * self.world_scale
        origin_s = jnp.asarray(
            np.asarray(voxel_origin, np.float64) * self.world_scale,
            jnp.float32,
        )
        steps_s = jnp.full((3,), step, jnp.float32)
        ny, nz = int(voxel_num_xyz[1]), int(voxel_num_xyz[2])
        sdf, sem, mask = _infer_chunks_grid(
            self.geo_params,
            self.sem_params if query_sem else self.geo_params,
            tuple(self.grid.features),
            tuple(self.grid.tables),
            origin_s, steps_s, jnp.int32(ny * nz), jnp.int32(nz),
            jnp.float32(self.ts),
            K, bs,
            tuple(self.grid.levels),
            self.grid.polynomial_interpolation,
            check_level,
            self.config.time_conditioned,
            query_sem,
        )
        sdf_out = (np.asarray(sdf).reshape(-1)[:n].astype(np.float64)
                   if query_sdf else None)
        sem_out = (np.asarray(sem).reshape(-1)[:n].astype(np.int64)
                   if query_sem else None)
        mask_out = np.asarray(mask).reshape(-1)[:n] if query_mask else None
        return sdf_out, sem_out, mask_out

    def query_grid_lattice(self, voxel_num_xyz, voxel_origin,
                           voxel_size: float, query_sem: bool = False):
        """Dense-grid inference via index-space blocks + node lattices
        (:func:`_infer_grid_blocks_lattice`): probes and corner gathers
        happen per block lattice cell instead of per point — the dense
        twin of the octree path's 23x lattice speedup.  The grid is not
        node-aligned, so per-level lattice sizes are
        floor(block_extent/cell) + 2.  Returns 3D (nx, ny, nz) arrays
        (sdf f32, sem or None, mask bool)."""
        vb = 8
        step = voxel_size * self.world_scale
        n_list = tuple(
            int((vb - 1) * step / (2.0 ** (1 - lvl))) + 2
            for lvl in self.grid.levels
        )
        n_max = max(n_list)
        block = vb ** 3
        onehot_cap = max(1, (128 << 20) // (block * n_max ** 3 * 4))
        npb = max(1, min(self.config.infer_bs // block, onehot_cap))
        nbx, nby, nbz = (int(-(int(v) // -vb)) for v in voxel_num_xyz)
        NB = nbx * nby * nbz
        K = _bucket_chunks(math.ceil(NB / npb))
        check_level = min(self.grid.featured_level_num,
                          self.config.mc_vis_level) - 1
        origin_s = jnp.asarray(
            np.asarray(voxel_origin, np.float64) * self.world_scale,
            jnp.float32,
        )
        sdf, sem, mask = _infer_grid_blocks_lattice(
            self.geo_params,
            self.sem_params if query_sem else self.geo_params,
            tuple(self.grid.features), tuple(self.grid.tables),
            origin_s, jnp.float32(step), jnp.int32(nby), jnp.int32(nbz),
            jnp.float32(self.ts), K, npb, vb, n_list,
            tuple(self.grid.levels), self.grid.polynomial_interpolation,
            check_level, self.config.time_conditioned, query_sem,
        )
        nx, ny, nz = (int(v) for v in voxel_num_xyz)

        def assemble(x):
            a = np.asarray(x).reshape(-1)[: NB * block]
            a = a.reshape(nbx, nby, nbz, vb, vb, vb)
            a = a.transpose(0, 3, 1, 4, 2, 5).reshape(
                nbx * vb, nby * vb, nbz * vb)
            return a[:nx, :ny, :nz]

        return (
            assemble(sdf),
            assemble(sem) if query_sem else None,
            assemble(mask),
        )

    # ------------------------------------------------------------------ grids
    def grid_shape_from_bbx(self, bbx, voxel_size: float):
        """(voxel_num_xyz, voxel_origin) for a world-space bbx — the grid
        geometry of ``get_query_from_bbx`` without materializing coords."""
        min_bound, max_bound = np.asarray(bbx[0], float), np.asarray(bbx[1], float)
        len_xyz = max_bound - min_bound
        voxel_num_xyz = (
            np.ceil(len_xyz / voxel_size) + self.config.pad_voxel * 2
        ).astype(np.int64)
        voxel_origin = min_bound - self.config.pad_voxel * voxel_size
        # extra voxel underground for the ground surface (utils/mesher.py:128-130)
        voxel_origin[2] -= voxel_size
        voxel_num_xyz[2] += 1
        return voxel_num_xyz, voxel_origin

    def get_query_from_bbx(self, bbx, voxel_size: float):
        """Dense grid covering a world-space bbx (utils/mesher.py:110-150).

        bbx: (min_bound, max_bound) arrays in metres.
        """
        voxel_num_xyz, voxel_origin = self.grid_shape_from_bbx(bbx, voxel_size)

        x = np.arange(voxel_num_xyz[0])
        y = np.arange(voxel_num_xyz[1])
        z = np.arange(voxel_num_xyz[2])
        gx, gy, gz = np.meshgrid(x, y, z, indexing="ij")
        coord = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1).astype(np.float64)
        coord = coord * voxel_size + voxel_origin[None, :]
        coord *= self.world_scale  # to [-1,1]
        return coord, voxel_num_xyz, voxel_origin

    def assign_to_bbx(self, sdf_pred, sem_pred, mc_mask, voxel_num_xyz):
        """Reshape flat query outputs to the 3D grid (utils/mesher.py:175-198)."""
        shape = tuple(int(v) for v in voxel_num_xyz)
        if sdf_pred is not None:
            sdf_pred = sdf_pred.reshape(shape)
        if sem_pred is not None:
            sem_pred = sem_pred.reshape(shape)
        if mc_mask is not None:
            mc_mask = mc_mask.reshape(shape).astype(bool)
        return sdf_pred, sem_pred, mc_mask

    # ------------------------------------------------------------------ mc
    def mc_mesh(self, mc_sdf, mc_mask, voxel_size: float, mc_origin):
        """Iso-surface extraction (utils/mesher.py:200-222)."""
        verts, faces = marching_tetrahedra(
            mc_sdf.astype(np.float64),
            level=0.0,
            mask=mc_mask if self.config.mc_mask_on else None,
            spacing=1.0,
        )
        verts = np.asarray(mc_origin)[None, :] + verts * voxel_size
        return verts, faces

    # ------------------------------------------------------------------ artifacts
    def generate_sdf_map(self, coord, sdf_pred, mc_mask, map_path: str):
        """Export the SDF as a point cloud with sdf in intensity
        (utils/mesher.py:152-173).  The reference tags each point with the
        observation mask in a labels channel; this exporter instead DROPS
        unobserved points (their SDF is trashbin garbage) so every exported
        value is a real prediction."""
        if mc_mask is not None:
            keep = np.asarray(mc_mask, bool)
            coord = coord[keep]
            sdf_pred = sdf_pred[keep]
        coord_world = coord / self.world_scale
        sdf_world = (
            sdf_pred
            * self.config.logistic_gaussian_ratio
            * self.config.sigma_sigmoid_m
        )
        pc = io.PointCloud(
            points=coord_world.astype(np.float64),
            intensity=sdf_world.astype(np.float64),
        )
        pc = pc.transform(self.global_transform)
        io.write_ply(map_path, pc)

    def estimate_vertices_sem(self, mesh: io.TriangleMesh, verts: np.ndarray,
                              filter_free_space_vertices: bool = True):
        """Predict vertex semantics + colors (utils/mesher.py:224-238)."""
        verts_scaled = verts * self.world_scale
        _, verts_sem, _ = self.query_points(
            verts_scaled, self.config.infer_bs, False, True, False
        )
        mesh.vertex_colors = labels_to_colors(verts_sem)
        if filter_free_space_vertices:
            keep = verts_sem > 0
            mesh = _remove_vertices(mesh, keep)
        return mesh

    def filter_isolated_vertices(self, mesh: io.TriangleMesh, filter_cluster_min_tri: int = 300):
        """Drop small connected triangle clusters (utils/mesher.py:240-251)."""
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components

        nv = mesh.vertices.shape[0]
        if nv == 0 or mesh.triangles.shape[0] == 0:
            return mesh
        tri = mesh.triangles
        rows = np.concatenate([tri[:, 0], tri[:, 1], tri[:, 2]])
        cols = np.concatenate([tri[:, 1], tri[:, 2], tri[:, 0]])
        adj = coo_matrix((np.ones(rows.size), (rows, cols)), shape=(nv, nv))
        _, labels = connected_components(adj, directed=False)
        tri_label = labels[tri[:, 0]]
        # threshold by TRIANGLE count per cluster, like the reference's
        # cluster_n_triangles (utils/mesher.py:240-251) — vertex counts
        # would delete valid patches with few vertices but many triangles
        counts = np.bincount(tri_label, minlength=int(labels.max()) + 1)
        tri_counts = counts[tri_label]
        keep_tri = tri_counts >= filter_cluster_min_tri
        mesh.triangles = tri[keep_tri]
        return mesh

    # ------------------------------------------------------------------ recon
    def recon_bbx_mesh(
        self,
        bbx,
        voxel_size: float,
        mesh_path: str,
        map_path: str,
        save_map: bool = False,
        estimate_sem: bool = False,
        estimate_normal: bool = True,
        filter_isolated_mesh: bool = True,
        filter_free_space_vertices: bool = True,
    ) -> io.TriangleMesh:
        """Dense bounding-box reconstruction (utils/mesher.py:253-290)."""
        if self.dp_mesh is not None:
            # dp_mesh batch sharding needs the explicit host-coord path
            coord, voxel_num_xyz, voxel_origin = self.get_query_from_bbx(
                bbx, voxel_size)
            sdf_pred, _, mc_mask = self.query_points(
                coord, self.config.infer_bs, True, False,
                self.config.mc_mask_on,
            )
            if save_map:
                self.generate_sdf_map(coord, sdf_pred, mc_mask, map_path)
            mc_sdf, _, mc_mask3 = self.assign_to_bbx(
                sdf_pred, None, mc_mask, voxel_num_xyz)
        else:
            voxel_num_xyz, voxel_origin = self.grid_shape_from_bbx(
                bbx, voxel_size)
            mc_sdf, _, mc_mask3 = self.query_grid_lattice(
                voxel_num_xyz, voxel_origin, voxel_size,
            )
            if save_map:
                # grid coords derive from indices; flatten in grid order to
                # match the 3D query outputs (get_query_from_bbx layout)
                coord, _, _ = self.get_query_from_bbx(bbx, voxel_size)
                self.generate_sdf_map(
                    coord, mc_sdf.reshape(-1).astype(np.float64),
                    mc_mask3.reshape(-1), map_path)
        verts, faces = self.mc_mesh(mc_sdf, mc_mask3, voxel_size, voxel_origin)
        return self._finalize_mesh(
            verts, faces, mesh_path, estimate_sem, estimate_normal,
            filter_isolated_mesh, filter_free_space_vertices,
        )

    def recon_octree_mesh(
        self,
        query_level: int,
        mc_res_m: float,
        mesh_path: str,
        map_path: str,
        save_map: bool = False,
        estimate_sem: bool = False,
        estimate_normal: bool = True,
        filter_isolated_mesh: bool = True,
        filter_free_space_vertices: bool = True,
    ) -> io.TriangleMesh:
        """Octree-tiled reconstruction at ``query_level``
        (utils/mesher.py:292-368): query per-node grid blocks, paste into a
        global grid, then one marching pass."""
        nodes = self.grid.get_octree_nodes(query_level)  # centers, [-1,1]
        if nodes.shape[0] == 0:
            return io.TriangleMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
        min_nodes = nodes.min(axis=0)
        max_nodes = nodes.max(axis=0)

        node_res = 2.0 ** (1 - query_level)  # node size in [-1,1]
        vox_per_node = int(np.ceil(node_res / self.world_scale / mc_res_m))
        mc_res_scaled = node_res / vox_per_node

        # round like the paste offsets below: float truncation can size the
        # grid one voxel short of the max node's block (e.g. extent/res =
        # 224.99999999999997 -> 224 while the offset rounds to 225)
        side = np.round(
            (max_nodes - min_nodes) / mc_res_scaled
        ).astype(int) + vox_per_node
        # float16 like the reference (utils/mesher.py:321-324): this dense
        # global grid is the peak host allocation of reconstruction
        grid_sdf = np.zeros(tuple(side), dtype=np.float16)
        grid_mask = np.zeros(tuple(side), dtype=bool)

        # ONE dispatch covers ALL node blocks: node origins upload once and
        # each lax.map step generates nodes_per_batch blocks' coordinates on
        # device — no host meshgrid, no per-batch round trips (the
        # reference queries per node, utils/mesher.py:326-336).  Inference
        # uses the node-LATTICE formulation (_infer_node_blocks_lattice):
        # per block, only the nested fine-node lattice is probed and its
        # corner rows gathered; points select their node's features with an
        # exact one-hot MXU matmul — bit-identical to the per-point path
        # at a tiny fraction of its (row-count-bound) gather cost.
        block = vox_per_node ** 3
        query_level = int(query_level)
        n_max = max(
            1 << max(0, lvl - query_level) for lvl in self.grid.levels
        )
        # cap the (npb, block, n^3) one-hot working set at ~128 MB
        onehot_cap = max(1, (128 << 20) // (block * n_max ** 3 * 4))
        nodes_per_batch = max(1, min(self.config.infer_bs // block,
                                     onehot_cap))
        box = (vox_per_node,) * 3
        n_nodes = nodes.shape[0]
        K = _bucket_chunks(math.ceil(n_nodes / nodes_per_batch))
        origins = (nodes - 0.5 * (node_res - mc_res_scaled)).astype(np.float32)
        pad = K * nodes_per_batch - n_nodes
        if pad:
            # padded origins sit outside [-1,1]: trash lookups, mask False
            origins = np.concatenate(
                [origins, np.full((pad, 3), 3.0, np.float32)], axis=0)
        check_level = min(self.grid.featured_level_num,
                          self.config.mc_vis_level) - 1
        _t = _mesh_stamp("setup", None)
        sdf_pred, _, mc_mask = _infer_node_blocks_lattice(
            self.geo_params, self.geo_params,
            tuple(self.grid.features), tuple(self.grid.tables),
            jnp.asarray(origins.reshape(K, nodes_per_batch, 3)),
            jnp.float32(mc_res_scaled), jnp.float32(self.ts),
            K, nodes_per_batch, vox_per_node, query_level,
            tuple(self.grid.levels), self.grid.polynomial_interpolation,
            check_level, self.config.time_conditioned, False,
        )
        sdf_pred = np.asarray(sdf_pred).reshape(-1)
        mc_mask = (np.asarray(mc_mask).reshape(-1)
                   if self.config.mc_mask_on else None)
        _t = _mesh_stamp("query+readback", _t)
        for k in range(n_nodes):
            sdf3, _, mask3 = self.assign_to_bbx(
                sdf_pred[k * block:(k + 1) * block],
                None,
                None if mc_mask is None else mc_mask[k * block:(k + 1) * block],
                box,
            )
            s = np.round(
                (nodes[k] - min_nodes) / node_res * vox_per_node
            ).astype(int)
            grid_sdf[s[0]:s[0]+vox_per_node, s[1]:s[1]+vox_per_node, s[2]:s[2]+vox_per_node] = sdf3
            if mask3 is not None:
                grid_mask[s[0]:s[0]+vox_per_node, s[1]:s[1]+vox_per_node, s[2]:s[2]+vox_per_node] = mask3

        _t = _mesh_stamp("paste", _t)
        mc_voxel_size = mc_res_scaled / self.world_scale
        mc_origin = (min_nodes - 0.5 * (node_res - mc_res_scaled)) / self.world_scale
        verts, faces = self.mc_mesh(grid_sdf, grid_mask, mc_voxel_size, mc_origin)
        _mesh_stamp("marching", _t)
        return self._finalize_mesh(
            verts, faces, mesh_path, estimate_sem, estimate_normal,
            filter_isolated_mesh, filter_free_space_vertices,
        )

    def _finalize_mesh(
        self, verts, faces, mesh_path, estimate_sem, estimate_normal,
        filter_isolated_mesh, filter_free_space_vertices,
    ) -> io.TriangleMesh:
        _t = _mesh_stamp("finalize-start", None)
        mesh = io.TriangleMesh(
            vertices=verts.astype(np.float64), triangles=faces.astype(np.int32)
        )
        if estimate_sem and self.sem_params is not None:
            mesh = self.estimate_vertices_sem(mesh, mesh.vertices, filter_free_space_vertices)
            _t = _mesh_stamp("vertex-sem", _t)
        if estimate_normal and mesh.vertices.shape[0] > 0:
            mesh.vertex_normals = vertex_normals(mesh.vertices, mesh.triangles)
            _t = _mesh_stamp("normals", _t)
        if filter_isolated_mesh:
            mesh = self.filter_isolated_vertices(mesh, self.config.min_cluster_vertices)
            _t = _mesh_stamp("cluster-filter", _t)
        mesh = mesh.transform(self.global_transform)
        if mesh_path:
            io.write_ply(mesh_path, mesh)
            _mesh_stamp("transform+write", _t)
        return mesh


def _remove_vertices(mesh: io.TriangleMesh, keep: np.ndarray) -> io.TriangleMesh:
    """Drop vertices (and their triangles), compacting indices."""
    remap = -np.ones(mesh.vertices.shape[0], dtype=np.int64)
    remap[keep] = np.arange(int(keep.sum()))
    tri_keep = keep[mesh.triangles].all(axis=1)
    tri = remap[mesh.triangles[tri_keep]]
    return io.TriangleMesh(
        vertices=mesh.vertices[keep],
        triangles=tri.astype(np.int32),
        vertex_normals=None if mesh.vertex_normals is None else mesh.vertex_normals[keep],
        vertex_colors=None if mesh.vertex_colors is None else mesh.vertex_colors[keep],
    )
