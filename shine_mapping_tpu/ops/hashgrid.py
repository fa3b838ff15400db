"""Sparse hierarchical feature grid as TPU-resident spatial hash tables.

This is the TPU-native replacement of the reference ``FeatureOctree``
(model/feature_octree.py:29-298).  The reference keeps per-level Python
dictionaries mapping node Morton codes to the 8 corner feature rows and pays
a device->host->device round trip **every training iteration**
(model/feature_octree.py:199-218 — called out in-repo as "the most
time-consuming part").  Here the structure is *data, not objects*:

per featured level ``l`` (bottom-up, index 0 = finest = ``max_level``):

* ``keys : int32[S_l, 2]``            open-addressing hash slots holding the
  packed integer voxel coordinate of an octree *node* per slot as an
  interleaved (x<<16|y, z) pair (one contiguous gather per probe window;
  empty slots have keys[:, 1] == EMPTY).
* ``corner_idx   : int32[S_l, 8]``    feature-table rows of the node's 8
  corners (the values of the reference's ``nodes_lookup_tables``,
  model/feature_octree.py:162-166).
* ``features     : f32[C_l, D]``      corner feature table; row ``C_l - 1``
  is the reserved zero "trashbin" row that misses gather (reproducing the
  ``-1`` -> zero-feature semantics of model/feature_octree.py:209-215,231-233).

Lookups are pure vectorized gathers (hash, probe a ``PROBE``-slot window,
compare, select) — no host sync, fully jittable, differentiable w.r.t. the
feature tables.  Structure growth (``HashGridHost.update``) happens host-side
per *frame* (infrequent) in vectorized numpy, mirroring
``FeatureOctree.update`` (model/feature_octree.py:114-166) including the
randn * feature_std initialization and the importance / last-frame shadow
tables used by continual learning.

Capacities are static per jit-compilation; they double on overflow which
triggers one amortized recompile.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

import functools

from .morton import CORNER_OFFSETS, quantize_points, quantize_points_np


@functools.partial(jax.jit, donate_argnames=("arr",))
def _scatter_set(arr: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """In-place (donated) row scatter used by structure growth."""
    return arr.at[idx].set(vals)


def _pad_pow2(idx: np.ndarray, *vals: np.ndarray):
    """Pad update batches to pow2 length (repeat last entry — idempotent
    set) so growth reuses a handful of compiled scatter executables instead
    of one per frame-specific shape."""
    n = idx.shape[0]
    if n == 0:
        return (None,) * (1 + len(vals))
    cap = 1
    while cap < n:
        cap *= 2
    pad = cap - n

    def p(a):
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        return jnp.asarray(a)

    return (p(idx),) + tuple(p(v) for v in vals)

# number of consecutive slots probed on lookup; insertion guarantees every
# key lands inside its window (the table is rebuilt bigger otherwise)
PROBE = 16

# empty-slot sentinel for key_b (z coordinate never reaches 2**32-1)
EMPTY = np.uint32(0xFFFFFFFF)

_H1 = np.uint32(2654435761)
_H2 = np.uint32(805459861)
_H3 = np.uint32(3674653429)


# --------------------------------------------------------------------------
# device-side structures


class LevelTable(NamedTuple):
    """Device arrays for one featured level's node hash table.

    ``keys`` interleaves the two packed key words per slot ((x<<16|y, z)
    bitcast to int32) so a lookup gathers ONE contiguous 8-byte pair per
    probe slot: two separate (N, PROBE) word gathers cost 4x more than the
    single (N, PROBE, 2) gather (experiments/exp_lookup.py: 10.5 -> 2.6 ms
    per iteration over 3 levels at bench scale).
    """

    keys: jnp.ndarray  # int32[S, 2] — (key_a, key_b) bitcast
    corner_idx: jnp.ndarray  # int32[S, 8]


def _hash_u32(x, y, z, mask):
    return ((x * _H1) ^ (y * _H2) ^ (z * _H3)) & mask


def _interleave_keys(key_a: np.ndarray, key_b: np.ndarray) -> jnp.ndarray:
    """Host (key_a, key_b) uint32 words -> device int32[S, 2] pairs."""
    return jnp.asarray(
        np.stack([key_a.view(np.int32), key_b.view(np.int32)], axis=1)
    )


def lookup_level(
    table: LevelTable, coords: jnp.ndarray, level: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find the node containing each query point at ``level``.

    Args:
        table: the level's hash table arrays.
        coords: (N, 3) float points in the [-1, 1] cube.
        level: octree level (static int).

    Returns:
        corners: (N, 8) int32 corner feature rows (trashbin row for misses —
            callers mask by ``found``).
        found: (N,) bool, node present in the map.

    Replaces reference ``FeatureOctree.get_indices``
    (model/feature_octree.py:199-218) without the per-iteration host sync.
    """
    q = quantize_points(coords, level).astype(jnp.uint32)
    return lookup_level_cells(table, q)


def lookup_level_cells(
    table: LevelTable, q: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`lookup_level` on pre-quantized integer node cells ``q``
    (..., 3) uint32 — callers that derive cells arithmetically (the
    mesher's node-lattice inference) skip the float quantization."""
    lead = q.shape[:-1]
    q = q.reshape(-1, 3)
    S = table.keys.shape[0]
    mask = jnp.uint32(S - 1)
    qa = (q[:, 0] << jnp.uint32(16)) | q[:, 1]
    qb = q[:, 2]
    h = _hash_u32(q[:, 0], q[:, 1], q[:, 2], mask)
    # probe window of PROBE consecutive slots (wrapping)
    win = (h[:, None] + jnp.arange(PROBE, dtype=jnp.uint32)[None, :]) & mask
    win = win.astype(jnp.int32)
    kk = table.keys[win]  # (N, PROBE, 2) — one contiguous gather
    qa_i = jax.lax.bitcast_convert_type(qa, jnp.int32)
    qb_i = jax.lax.bitcast_convert_type(qb, jnp.int32)
    hit = (kk[:, :, 0] == qa_i[:, None]) & (kk[:, :, 1] == qb_i[:, None])
    found = jnp.any(hit, axis=1)
    slot = jnp.take_along_axis(win, jnp.argmax(hit, axis=1)[:, None], axis=1)[:, 0]
    corners = table.corner_idx[slot]  # (N, 8) — trashbin rows when not found
    return corners.reshape(lead + (8,)), found.reshape(lead)


# --------------------------------------------------------------------------
# host-side growable structure


def _pack64(q: np.ndarray) -> np.ndarray:
    """(N,3) int coords -> unique int64 key (level <= 16)."""
    q = q.astype(np.int64)
    return (q[:, 0] << 32) | (q[:, 1] << 16) | q[:, 2]


def _unpack64(k: np.ndarray) -> np.ndarray:
    k = k.astype(np.int64)
    x = (k >> 32) & 0xFFFF
    y = (k >> 16) & 0xFFFF
    z = k & 0xFFFF
    return np.stack([x, y, z], axis=-1).astype(np.int32)


def _isin_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in an ascending-sorted array."""
    if sorted_arr.size == 0:
        return np.zeros(values.shape, dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos = np.clip(pos, 0, sorted_arr.size - 1)
    return sorted_arr[pos] == values


@dataclasses.dataclass
class _HostLevel:
    """Host mirror + bookkeeping for one featured level."""

    level: int
    node_capacity: int
    corner_capacity: int  # feature rows incl. trashbin (last row)
    # hash-table mirrors
    key_a: np.ndarray = None  # uint32[S]
    key_b: np.ndarray = None  # uint32[S]
    corner_idx: np.ndarray = None  # int32[S, 8]
    # insertion-ordered node data (survives table rebuilds)
    node_coords: np.ndarray = None  # int32[n_nodes, 3]
    node_corner_rows: np.ndarray = None  # int32[n_nodes, 8]
    node_keys_sorted: np.ndarray = None  # int64[n_nodes] (ascending)
    # corner membership: ascending keys + their feature rows
    corner_keys_sorted: np.ndarray = None  # int64[n_corners]
    corner_rows_sorted: np.ndarray = None  # int32[n_corners]
    n_nodes: int = 0
    n_corners: int = 0

    def __post_init__(self):
        S = self.node_capacity
        self.key_a = np.zeros(S, dtype=np.uint32)
        self.key_b = np.full(S, EMPTY, dtype=np.uint32)
        self.corner_idx = np.full(
            (S, 8), self.corner_capacity - 1, dtype=np.int32
        )
        self.node_coords = np.zeros((0, 3), dtype=np.int32)
        self.node_corner_rows = np.zeros((0, 8), dtype=np.int32)
        self.node_keys_sorted = np.zeros(0, dtype=np.int64)
        self.corner_keys_sorted = np.zeros(0, dtype=np.int64)
        self.corner_rows_sorted = np.zeros(0, dtype=np.int32)

    # -- hash insertion ----------------------------------------------------
    def _try_insert_all(self, coords: np.ndarray, rows: np.ndarray) -> bool:
        """Insert nodes into the (cleared or existing) table mirror.

        Vectorized round-based probing: round ``p`` tries slot ``h + d_i``
        (each key's current displacement); winners per free slot are chosen
        with np.unique, losers advance their displacement.  Produces a valid
        open-addressing layout where every key sits within PROBE slots of
        its hash — the only invariant the device lookup needs.

        Returns False if any key's probe window overflowed (caller rebuilds
        with a larger table).
        """
        n = coords.shape[0]
        # slots written by the most recent successful call — the caller's
        # incremental device scatter uses this instead of reading the whole
        # device table back to diff it (an MB-scale readback per level per
        # frame through the tunnel)
        self.last_insert_touched = np.zeros(0, dtype=np.int32)
        if n == 0:
            return True
        touched_rounds = []
        S = self.node_capacity
        mask = np.uint32(S - 1)
        x = coords[:, 0].astype(np.uint32)
        y = coords[:, 1].astype(np.uint32)
        z = coords[:, 2].astype(np.uint32)
        ka = (x << np.uint32(16)) | y
        h = ((x * _H1) ^ (y * _H2) ^ (z * _H3)) & mask

        pending = np.arange(n)
        disp = np.zeros(n, dtype=np.uint32)
        # a key advances its displacement at most once per round; allow a few
        # extra rounds so slot contention inside one batch doesn't force a
        # premature rebuild
        for _round in range(4 * PROBE):
            if pending.size == 0:
                if touched_rounds:
                    self.last_insert_touched = np.concatenate(
                        touched_rounds).astype(np.int32)
                return True
            slots = (h[pending] + disp[pending]) & mask
            free = self.key_b[slots] == EMPTY
            # among pending keys targeting the same free slot, first wins
            cand = np.nonzero(free)[0]
            if cand.size:
                uniq_slots, first = np.unique(slots[cand], return_index=True)
                winners = pending[cand[first]]
                self.key_a[uniq_slots] = ka[winners]
                self.key_b[uniq_slots] = z[winners]
                self.corner_idx[uniq_slots] = rows[winners]
                touched_rounds.append(uniq_slots)
                placed = np.zeros(pending.size, dtype=bool)
                placed[cand[first]] = True
            else:
                placed = np.zeros(pending.size, dtype=bool)
            disp[pending[~placed]] += 1
            over = disp[pending[~placed]] >= PROBE
            if np.any(over):
                return False
            pending = pending[~placed]
        if pending.size == 0:
            if touched_rounds:
                self.last_insert_touched = np.concatenate(
                    touched_rounds).astype(np.int32)
            return True
        return False

    def _rebuild_table(self) -> None:
        """Re-hash every node into a (possibly larger) fresh table."""
        while True:
            S = self.node_capacity
            self.key_a = np.zeros(S, dtype=np.uint32)
            self.key_b = np.full(S, EMPTY, dtype=np.uint32)
            self.corner_idx = np.full((S, 8), self.corner_capacity - 1, dtype=np.int32)
            if self._try_insert_all(self.node_coords, self.node_corner_rows):
                return
            self.node_capacity *= 2

    def memory_bytes(self) -> int:
        return int(
            self.key_a.nbytes + self.key_b.nbytes + self.corner_idx.nbytes
        )


class HashGridHost:
    """Growable hierarchical feature grid (host controller).

    Owns numpy mirrors of the per-level hash tables plus the device feature
    tables and shadow tables (importance / last-frame) for continual
    learning.  ``update`` mirrors reference ``FeatureOctree.update``
    (model/feature_octree.py:114-166); queries run device-side through
    :func:`lookup_level` / ``ops.query``.
    """

    def __init__(
        self,
        max_level: int,
        featured_level_num: int,
        feature_dim: int,
        feature_std: float,
        polynomial_interpolation: bool = True,
        leaf_vox_size: float = 0.5,
        seed: int = 42,
        init_node_capacity: int = 1 << 15,
        init_corner_capacity: int = 1 << 16,
        dtype=jnp.float32,
    ):
        if featured_level_num < 1:
            raise ValueError("No level with grid features!")
        if max_level > 15:
            # corner coordinates reach 2**level; _pack64's 16-bit y/z
            # fields alias (x, y, 65536) with (x, y+1, 0) at level 16 —
            # refuse rather than silently corrupt geometry.  (Reference
            # configs use <= 12; a wider packing would also change
            # persisted checkpoint keys.)
            raise ValueError(
                f"max_level {max_level} > 15: corner keys would overflow "
                "the packed 16-bit coordinate fields"
            )
        self.max_level = max_level
        self.featured_level_num = featured_level_num
        self.free_level_num = max_level - featured_level_num + 1
        self.feature_dim = feature_dim
        self.feature_std = feature_std
        self.polynomial_interpolation = polynomial_interpolation
        self.leaf_vox_size = leaf_vox_size
        self.dtype = dtype
        self.rng = np.random.default_rng(seed)

        # bottom-up: index 0 = finest level (max_level)
        self.levels: Tuple[int, ...] = tuple(
            max_level - i for i in range(featured_level_num)
        )
        self.host_levels: List[_HostLevel] = [
            _HostLevel(
                level=l,
                node_capacity=init_node_capacity,
                corner_capacity=init_corner_capacity,
            )
            for l in self.levels
        ]
        # device state
        self.tables: List[LevelTable] = [
            LevelTable(
                keys=_interleave_keys(hl.key_a, hl.key_b),
                corner_idx=jnp.asarray(hl.corner_idx),
            )
            for hl in self.host_levels
        ]
        self.features: List[jnp.ndarray] = [
            jnp.zeros((hl.corner_capacity, feature_dim), dtype=dtype)
            for hl in self.host_levels
        ]
        # continual-learning shadows (reference model/feature_octree.py:143-146)
        self.importance_weight: List[jnp.ndarray] = [
            jnp.zeros((hl.corner_capacity, feature_dim), dtype=dtype)
            for hl in self.host_levels
        ]
        self.features_last_frame: List[jnp.ndarray] = [
            jnp.zeros((hl.corner_capacity, feature_dim), dtype=dtype)
            for hl in self.host_levels
        ]
        self.structure_version = 0  # bumps on capacity change (=> recompile)

    # ---------------------------------------------------------------- properties
    def is_empty(self) -> bool:
        return all(hl.n_nodes == 0 for hl in self.host_levels)

    @property
    def corner_counts(self) -> List[int]:
        return [hl.n_corners for hl in self.host_levels]

    # ---------------------------------------------------------------- growth
    def update(self, surface_points: np.ndarray, incremental_on: bool = False) -> None:
        """Grow the structure from new surface points ([-1,1] cube coords).

        Mirrors reference ``FeatureOctree.update`` (model/feature_octree.py:
        114-166): for each featured level, find unseen nodes, allocate their
        unique corners with randn * feature_std init, and record the node ->
        corner-row mapping.  When ``incremental_on``, importance weights are
        zero-extended and the last-frame feature snapshot refreshed
        (model/feature_octree.py:143-146,157-160).
        """
        # float32, matching the device-side query quantization exactly — a
        # float64 build would disagree with f32 queries at voxel boundaries
        surface_points = np.asarray(surface_points, dtype=np.float32)
        for li, hl in enumerate(self.host_levels):
            level = hl.level
            q = quantize_points_np(surface_points, level)
            node_keys = np.unique(_pack64(q))
            new_mask = ~_isin_sorted(node_keys, hl.node_keys_sorted)
            new_keys = node_keys[new_mask]
            if new_keys.size == 0:
                if incremental_on:
                    self.features_last_frame[li] = self.features[li]
                continue
            new_nodes = _unpack64(new_keys)  # (M, 3)

            # unique corners of the new nodes
            corners = (
                new_nodes[:, None, :] + CORNER_OFFSETS[None, :, :]
            ).reshape(-1, 3)
            corner_keys = _pack64(corners)
            uniq_ck = np.unique(corner_keys)
            new_ck = uniq_ck[~_isin_sorted(uniq_ck, hl.corner_keys_sorted)]
            n_new_corners = new_ck.size

            # capacity management (features): trashbin occupies the last row
            need = hl.n_corners + n_new_corners
            grew_feat = False
            while need > hl.corner_capacity - 1:
                hl.corner_capacity *= 2
                grew_feat = True
            if grew_feat:
                self._grow_feature_tables(li)

            # assign rows for the new corners (ascending-key order within the
            # batch, matching the reference's torch.unique ordering at
            # model/feature_octree.py:132-136)
            new_rows = np.arange(
                hl.n_corners, hl.n_corners + n_new_corners, dtype=np.int32
            )
            hl.n_corners += n_new_corners
            # O(n) sorted-merge insert (both arrays already ascending)
            pos = np.searchsorted(hl.corner_keys_sorted, new_ck)
            hl.corner_keys_sorted = np.insert(hl.corner_keys_sorted, pos, new_ck)
            hl.corner_rows_sorted = np.insert(hl.corner_rows_sorted, pos, new_rows)

            # rows for all 8 corners of each new node
            pos = np.searchsorted(hl.corner_keys_sorted, corner_keys)
            rows8 = hl.corner_rows_sorted[pos].reshape(-1, 8).astype(np.int32)

            # record nodes (insertion order) and update membership
            hl.node_coords = np.concatenate([hl.node_coords, new_nodes], axis=0)
            hl.node_corner_rows = np.concatenate(
                [hl.node_corner_rows, rows8], axis=0
            )
            hl.node_keys_sorted = np.insert(
                hl.node_keys_sorted,
                np.searchsorted(hl.node_keys_sorted, new_keys),
                new_keys,
            )
            hl.n_nodes += new_keys.size

            # node hash-table insertion (grow + rebuild on pressure)
            grew_table = False
            if hl.n_nodes > hl.node_capacity // 2:
                while hl.n_nodes > hl.node_capacity // 2:
                    hl.node_capacity *= 2
                grew_table = True
            if grew_table:
                hl._rebuild_table()
                self.tables[li] = LevelTable(
                    keys=_interleave_keys(hl.key_a, hl.key_b),
                    corner_idx=jnp.asarray(hl.corner_idx),
                )
                self.structure_version += 1
            else:
                if not hl._try_insert_all(new_nodes, rows8):
                    hl.node_capacity *= 2
                    hl._rebuild_table()
                    self.tables[li] = LevelTable(
                        keys=_interleave_keys(hl.key_a, hl.key_b),
                        corner_idx=jnp.asarray(hl.corner_idx),
                    )
                    self.structure_version += 1
                else:
                    # incremental device scatter: only the slots the insert
                    # wrote (recorded host-side — no device-table readback)
                    touched = hl.last_insert_touched
                    t = self.tables[li]
                    pairs = np.stack(
                        [hl.key_a[touched].view(np.int32),
                         hl.key_b[touched].view(np.int32)], axis=1)
                    idx_j, kab_j, ci_j = _pad_pow2(
                        touched, pairs, hl.corner_idx[touched],
                    )
                    if idx_j is not None:
                        self.tables[li] = LevelTable(
                            keys=_scatter_set(t.keys, idx_j, kab_j),
                            corner_idx=_scatter_set(t.corner_idx, idx_j, ci_j),
                        )
                        # every table mutation must be visible to version-
                        # keyed caches (the mesher's dp_mesh replication)
                        self.structure_version += 1

            # new feature rows: randn * feature_std (reference
            # model/feature_octree.py:139,153)
            init = (
                self.feature_std
                * self.rng.standard_normal((n_new_corners, self.feature_dim))
            ).astype(np.float32)
            rows_j, init_j = _pad_pow2(new_rows, init)
            if rows_j is not None:
                # n_new_corners can be 0 with new NODES: a frame can fill a
                # "hole" voxel whose 8 corners were all allocated by its
                # neighbors — the node mappings above still record it
                self.features[li] = _scatter_set(self.features[li], rows_j, init_j)
            if incremental_on:
                # importance rows start at zero (already zero); refresh snapshot
                self.features_last_frame[li] = self.features[li]

    def _grow_feature_tables(self, li: int) -> None:
        """Double a level's feature-table capacity (zero-padded)."""
        hl = self.host_levels[li]
        C = hl.corner_capacity

        def pad(a: jnp.ndarray) -> jnp.ndarray:
            out = jnp.zeros((C, a.shape[1]), dtype=a.dtype)
            return out.at[: a.shape[0]].set(a)

        self.features[li] = pad(self.features[li])
        self.importance_weight[li] = pad(self.importance_weight[li])
        # the last-frame snapshot is refreshed by update() right after growth
        # (and its old buffer may have been donated to a train step), so
        # re-alias instead of padding the stale array
        self.features_last_frame[li] = self.features[li]
        # _rebuild_table() reinitializes corner_idx from node data with the
        # NEW capacity's trashbin default, repointing miss slots itself
        hl._rebuild_table()
        self.tables[li] = LevelTable(
            keys=_interleave_keys(hl.key_a, hl.key_b),
            corner_idx=jnp.asarray(hl.corner_idx),
        )
        self.structure_version += 1

    # ---------------------------------------------------------------- queries (host conveniences)
    def get_octree_nodes(self, level: int) -> np.ndarray:
        """Node-center coordinates at ``level`` in the [-1,1] cube.

        Mirrors reference ``FeatureOctree.get_octree_nodes``
        (model/feature_octree.py:94-101); used by the octree-tiled mesher.
        """
        li = self.levels.index(level)
        coords = self.host_levels[li].node_coords.astype(np.float64)
        node_size = 2.0 ** (1 - level)
        return coords * node_size - 1.0 + 0.5 * node_size

    def print_detail(self) -> str:
        """Per-level corner counts + map memory (model/feature_octree.py:288-298)."""
        lines = ["Current map structure:"]
        total = 0
        # report top-down like the reference (coarse first)
        for i in range(self.featured_level_num - 1, -1, -1):
            hl = self.host_levels[i]
            vox = self.leaf_vox_size * (2 ** (self.max_level - hl.level))
            cnt = hl.n_corners + 1  # + trashbin, matching reference count
            lines.append("%.2f m: %d voxel corners" % (vox, cnt))
            total += cnt
        mem = total * self.feature_dim * 4 / 1024 / 1024
        lines.append(
            "memory: %d x %d x 4 = %.3f MB" % (total, self.feature_dim, mem)
        )
        out = "\n".join(lines)
        print(out)
        return out

    # ---------------------------------------------------------------- (de)serialization
    def state_dict(self) -> dict:
        """Everything needed to restore the structure + features."""
        d = {
            "max_level": self.max_level,
            "featured_level_num": self.featured_level_num,
            "feature_dim": self.feature_dim,
            "feature_std": self.feature_std,
            "poly": self.polynomial_interpolation,
            "leaf_vox_size": self.leaf_vox_size,
        }
        for i, hl in enumerate(self.host_levels):
            d[f"lvl{i}_node_coords"] = hl.node_coords
            d[f"lvl{i}_node_corner_rows"] = hl.node_corner_rows
            d[f"lvl{i}_n_corners"] = hl.n_corners
            d[f"lvl{i}_features"] = np.asarray(self.features[i])
            d[f"lvl{i}_importance"] = np.asarray(self.importance_weight[i])
        return d

    @classmethod
    def from_state_dict(cls, d: dict, seed: int = 42) -> "HashGridHost":
        g = cls(
            max_level=int(d["max_level"]),
            featured_level_num=int(d["featured_level_num"]),
            feature_dim=int(d["feature_dim"]),
            feature_std=float(d["feature_std"]),
            polynomial_interpolation=bool(d["poly"]),
            leaf_vox_size=float(d["leaf_vox_size"]),
            seed=seed,
        )
        for i, hl in enumerate(g.host_levels):
            coords = d[f"lvl{i}_node_coords"]
            rows = d[f"lvl{i}_node_corner_rows"]
            n_corners = int(d[f"lvl{i}_n_corners"])
            feats = d[f"lvl{i}_features"]
            hl.corner_capacity = feats.shape[0]
            hl.n_corners = n_corners
            hl.n_nodes = coords.shape[0]
            hl.node_coords = coords.astype(np.int32)
            hl.node_corner_rows = rows.astype(np.int32)
            keys = _pack64(coords)
            order = np.argsort(keys)
            hl.node_keys_sorted = keys[order]
            # corner membership is rebuildable from node corners
            all_corners = (
                coords[:, None, :] + CORNER_OFFSETS[None, :, :]
            ).reshape(-1, 3)
            ck = _pack64(all_corners)
            cr = rows.reshape(-1)
            uk, first = np.unique(ck, return_index=True)
            hl.corner_keys_sorted = uk
            hl.corner_rows_sorted = cr[first].astype(np.int32)
            while hl.n_nodes > hl.node_capacity // 2:
                hl.node_capacity *= 2
            hl._rebuild_table()
            g.tables[i] = LevelTable(
                keys=_interleave_keys(hl.key_a, hl.key_b),
                corner_idx=jnp.asarray(hl.corner_idx),
            )
            g.features[i] = jnp.asarray(feats)
            if f"lvl{i}_importance" in d:
                g.importance_weight[i] = jnp.asarray(d[f"lvl{i}_importance"])
            g.features_last_frame[i] = g.features[i]
        g.structure_version += 1
        return g
