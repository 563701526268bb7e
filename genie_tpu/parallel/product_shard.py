"""Source-partitioned product-graph parallelism (pod-scale config).

BASELINE config 5: ~1000 stations × ~1M source nodes — the dense product
tensor no longer fits one chip. Partition the *source* axis over the mesh:

  * station-axis aggregation (``A_prod_sta_sta``) is embarrassingly local —
    each shard holds complete station rows for its sources;
  * source-axis aggregation (``A_prod_src_src``) needs neighbour source rows
    that may live on other shards. Because the source kNN graph is static
    per grid, the halo is precomputed: for every ordered shard pair (i → j)
    the exact rows i must send to j. At run time the halos are exchanged
    over ICI, then the aggregation is a purely local fixed-k gather into
    [local ‖ halo] rows.

Partitioning is by sorted spatial order (Morton-style z-curve on the source
positions), so kNN neighbours are overwhelmingly on-shard and the halo is a
thin boundary layer concentrated at ADJACENT shards in sorted order (the
pair-traffic matrix is banded around the diagonal). The exchange therefore
runs as one ``ppermute`` round per active circular shard offset d, each
padded only to that offset's max pair size — measured 3.4× less moved
bytes than a single ``all_to_all`` padded to the global per-pair max on a
clustered 8k cloud (scripts/measure_scaling.py), and offset-1 dominance
means the traffic rides nearest-neighbour ICI links. All shapes static.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SrcPartition(NamedTuple):
    n_shards: int
    n_local: int
    halo_total: int          # Σ_d H_d: total halo rows per shard
    offsets: tuple           # static circular shard offsets d with traffic
    halo_base: tuple         # static halo block base per offset (same order)
    perm: jnp.ndarray        # (n_src,) original → sorted order
    inv_perm: jnp.ndarray    # (n_src,)
    off_send_idx: tuple      # per offset: (n_shards, H_d) sender-local rows
                             #   shard i sends to (i+d) % n_shards
    off_send_valid: tuple    # per offset: (n_shards, H_d) bool (stats only)
    local_nbr: jnp.ndarray   # (n_shards, n_local, k) neighbour ids in local
                             #   frame: [0, n_local) local rows,
                             #   n_local + halo_base[di] + h = halo row h of
                             #   offset block di
    nbr_valid: jnp.ndarray   # (n_shards, n_local, k) bool

    @property
    def halo_rows_valid(self) -> int:
        """Exact halo rows exchanged (all shards, no padding)."""
        return int(sum(int(np.asarray(v).sum()) for v in self.off_send_valid))

    @property
    def halo_rows_moved(self) -> int:
        """Halo rows actually moved incl. per-offset padding (all shards)."""
        return self.n_shards * self.halo_total


def _morton_order(pos):
    """Sort positions along a z-curve for spatial locality."""
    p = np.asarray(pos, np.float64)
    # isotropic quantization: one metre-per-level scale for all axes. Per-axis
    # normalization would stretch a thin axis (seismicity depth: tens of km vs
    # hundreds horizontally) to full resolution, interleaving its bits at fine
    # granularity and destroying horizontal locality — measured 74% halo rows
    # vs 11% isotropic on a clustered 32k cloud (scripts/scaling_model.py).
    q = ((p - p.min(0)) / max(float(np.ptp(p, 0).max()), 1e-9) * 1023).astype(np.uint64)

    def spread(x):
        x &= 0x3FF
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def build_partition(src_pos, src_nbr, n_shards: int) -> SrcPartition:
    """Host-side construction of the static halo-exchange plan."""
    n_src, k = np.asarray(src_nbr).shape
    assert n_src % n_shards == 0, "pad the source grid to a shard multiple"
    n_local = n_src // n_shards
    perm = _morton_order(src_pos)
    inv_perm = np.argsort(perm)

    # neighbours in sorted frame
    nbr_sorted = inv_perm[np.asarray(src_nbr)[perm]]     # (n_src, k)
    owner = np.arange(n_src) // n_local                  # shard of each sorted row

    send: dict[tuple[int, int], list[int]] = {}
    for j in range(n_shards):
        rows = nbr_sorted[j * n_local:(j + 1) * n_local]
        for i in np.unique(owner[rows.reshape(-1)]):
            if i == j:
                continue
            need = np.unique(rows.reshape(-1)[owner[rows.reshape(-1)] == i])
            send[(int(i), int(j))] = sorted(need.tolist())

    # group pairs by circular shard offset d = (j - i) mod n: Morton locality
    # makes small offsets carry nearly all rows, so padding each offset to
    # its own max pair size moves far fewer bytes than one global pad
    offsets = sorted({(j - i) % n_shards for (i, j) in send})
    H_d = {d: max((len(rows) for (i, j), rows in send.items()
                   if (j - i) % n_shards == d), default=1)
           for d in offsets}
    halo_base, acc = {}, 0
    for d in offsets:
        halo_base[d] = acc
        acc += H_d[d]
    halo_total = acc

    off_send_idx = {d: np.zeros((n_shards, H_d[d]), np.int32) for d in offsets}
    off_send_valid = {d: np.zeros((n_shards, H_d[d]), bool) for d in offsets}
    recv_pos: dict[tuple[int, int], dict[int, int]] = {}
    for (i, j), rows in send.items():
        d = (j - i) % n_shards
        off_send_idx[d][i, :len(rows)] = np.asarray(rows) - i * n_local
        off_send_valid[d][i, :len(rows)] = True
        recv_pos[(i, j)] = {r: h for h, r in enumerate(rows)}

    # local-frame neighbour table per shard: halo row for sorted-global id g
    # owned by shard p, received by j via offset d = (j-p) mod n, sits at
    # n_local + halo_base[d] + h (receiver's halo concatenates the
    # per-offset ppermute blocks in `offsets` order)
    local_nbr = np.zeros((n_shards, n_local, k), np.int32)
    nbr_valid = np.ones((n_shards, n_local, k), bool)
    for j in range(n_shards):
        rows = nbr_sorted[j * n_local:(j + 1) * n_local]
        out = np.zeros_like(rows)
        for a in range(n_local):
            for b in range(k):
                g = rows[a, b]
                p = owner[g]
                if p == j:
                    out[a, b] = g - j * n_local
                else:
                    d = (j - p) % n_shards
                    h = recv_pos[(int(p), j)][int(g)]
                    out[a, b] = n_local + halo_base[d] + h
        local_nbr[j] = out

    return SrcPartition(
        n_shards=n_shards, n_local=n_local, halo_total=halo_total,
        offsets=tuple(offsets),
        halo_base=tuple(halo_base[d] for d in offsets),
        perm=jnp.asarray(perm, jnp.int32), inv_perm=jnp.asarray(inv_perm, jnp.int32),
        off_send_idx=tuple(jnp.asarray(off_send_idx[d]) for d in offsets),
        off_send_valid=tuple(jnp.asarray(off_send_valid[d]) for d in offsets),
        local_nbr=jnp.asarray(local_nbr), nbr_valid=jnp.asarray(nbr_valid),
    )


def halo_exchange(x_local, part: SrcPartition, shard_id, axis_name: str,
                  remap_block=None, wire_dtype=None):
    """Inside shard_map: exchange halo rows — one ``ppermute`` per active
    circular shard offset, each padded only to that offset's max pair size.

    x_local: (n_local, ...) this shard's rows (sorted frame).
    remap_block: optional callable ``(block, offset_index) -> block`` applied
    to each received offset block (station-frame remap for the distributed
    subgraph) before concatenation.
    wire_dtype: optional mixed-precision collective — rows cross ICI in this
    dtype (``jnp.bfloat16`` halves exchange bytes; the standard f32-compute/
    bf16-comm trick) and are cast back to ``x_local.dtype`` on arrival. The
    halo rows only feed fixed-k mean aggregations, so the bf16 rounding is
    bounded at ~3 decimal digits per contribution (tested against dense).
    Returns (halo_total, ...) — per-offset blocks in ``part.offsets`` order
    (matching the ``local_nbr`` halo layout).
    """
    n = part.n_shards
    blocks = []
    for di, (d, si) in enumerate(zip(part.offsets, part.off_send_idx)):
        send = x_local[si[shard_id]]                   # (H_d, ...)
        if wire_dtype is not None:
            send = send.astype(wire_dtype)
        recv = jax.lax.ppermute(
            send, axis_name, perm=[(i, (i + d) % n) for i in range(n)])
        if wire_dtype is not None:
            recv = recv.astype(x_local.dtype)
        if remap_block is not None:
            recv = remap_block(recv, di)
        blocks.append(recv)
    if not blocks:
        return jnp.zeros((0,) + x_local.shape[1:], x_local.dtype)
    return jnp.concatenate(blocks, axis=0)


def sharded_gather_mean_src_axis(x_local, part: SrcPartition, shard_id,
                                 axis_name: str, wire_dtype=None):
    """Source-axis fixed-k mean aggregation under source partitioning.

    x_local: (n_local, n_sta, C) — this shard's product rows.
    Equivalent to ``gather_mean_src_axis`` on the unsharded (sorted) tensor
    (exactly with ``wire_dtype=None``; to bf16 rounding of the halo
    contributions with ``wire_dtype=jnp.bfloat16``).
    """
    halo = halo_exchange(x_local, part, shard_id, axis_name,
                         wire_dtype=wire_dtype)
    x_ext = jnp.concatenate((x_local, halo), axis=0)
    nbr = part.local_nbr[shard_id]                     # (n_local, k)
    g = x_ext[nbr]                                     # (n_local, k, n_sta, C)
    return g.mean(axis=1)


class StaSubsel(NamedTuple):
    """Per-shard station sub-selection (the distributed subgraph of SURVEY
    §7.3 / ref ``use_subgraph``, process_utils.py:744-849): each source
    shard only materializes the stations its local sources pair with, so
    the product tensor is (n_local, n_sel+1, C) instead of
    (n_local, n_sta, C). Row ``n_sel`` of every per-shard station axis is a
    reserved all-zero sentinel; out-of-subset station references point at it
    (contributing exactly the zero the masked-dense computation reads).

    ``col_map`` remaps halo source rows between shard station frames: the
    receiver's column r (global station sta_sel[recv, r]) reads the sender's
    column ``col_map[recv, send, r]`` (sentinel when the sender does not
    carry that station).

    Aggregation semantics under sub-selection (the reference's true-subgraph
    behaviour — absent pairs contribute nothing, process_utils.py:744-849):
    station-axis means run over the carried valid neighbours only
    (``sta_nbr_valid`` drops out-of-union neighbours from numerator AND
    denominator); source-axis means keep the fixed k denominator with
    zero contribution for stations a sender shard does not carry (the
    caller zeroes the sentinel column of the value tensor — see
    ``make_subgraph_sharded_detection_forward``). With an all-True pair
    mask both reduce exactly to the dense computation."""

    n_sel: int                   # station budget per shard (max subset size)
    sta_sel: jnp.ndarray         # (n_shards, n_sel) global station ids
    sel_valid: jnp.ndarray       # (n_shards, n_sel) bool (False = padding)
    sta_nbr: jnp.ndarray         # (n_shards, n_sel+1, k) local-frame neighbours
    sta_nbr_valid: jnp.ndarray   # (n_shards, n_sel+1, k)
    col_map: jnp.ndarray         # (n_shards_recv, n_shards_send, n_sel+1)


def build_station_subselection(a_src_in_sta, part: SrcPartition,
                               sta_nbr, sta_nbr_valid) -> StaSubsel:
    """Host-side plan: per-shard observed-station subsets from the ε+kNN
    pair mask (``genie_tpu.graphs.subgraph.pair_mask``), remapped neighbour
    tables, and the inter-shard station-frame column maps."""
    mask = np.asarray(a_src_in_sta)[np.asarray(part.perm)]   # sorted frame
    n_shards, n_local = part.n_shards, part.n_local
    n_sta = mask.shape[1]
    blocks = mask.reshape(n_shards, n_local, n_sta)
    subsets = [np.where(b.any(axis=0))[0] for b in blocks]
    n_sel = max(max((len(s) for s in subsets), default=1), 1)

    sta_sel = np.zeros((n_shards, n_sel), np.int32)
    sel_valid = np.zeros((n_shards, n_sel), bool)
    g2l = np.full((n_shards, n_sta), n_sel, np.int32)        # sentinel default
    for j, s in enumerate(subsets):
        sta_sel[j, :len(s)] = s
        sel_valid[j, :len(s)] = True
        g2l[j, s] = np.arange(len(s))

    nbr = np.asarray(sta_nbr)
    nv = np.asarray(sta_nbr_valid)
    k = nbr.shape[1]
    # local neighbour tables: out-of-union neighbours are dropped from both
    # numerator and denominator (true-subgraph semantics); with an all-True
    # pair mask this is exactly the original table
    sta_nbr_l = np.full((n_shards, n_sel + 1, k), n_sel, np.int32)
    sta_nbr_valid_l = np.zeros((n_shards, n_sel + 1, k), bool)
    for j in range(n_shards):
        loc = g2l[j][nbr[sta_sel[j]]]
        sta_nbr_l[j, :n_sel] = loc
        sta_nbr_valid_l[j, :n_sel] = (nv[sta_sel[j]] & sel_valid[j][:, None]
                                      & (loc < n_sel))
    # padded rows keep all-False validity: their outputs are never gathered
    # (g2l never maps to padding rows) and are masked downstream

    col_map = np.full((n_shards, n_shards, n_sel + 1), n_sel, np.int32)
    for r in range(n_shards):
        for s in range(n_shards):
            col_map[r, s, :n_sel] = g2l[s][sta_sel[r]]
            col_map[r, s, :n_sel][~sel_valid[r]] = n_sel

    return StaSubsel(
        n_sel=n_sel, sta_sel=jnp.asarray(sta_sel), sel_valid=jnp.asarray(sel_valid),
        sta_nbr=jnp.asarray(sta_nbr_l), sta_nbr_valid=jnp.asarray(sta_nbr_valid_l),
        col_map=jnp.asarray(col_map),
    )


def sharded_gather_mean_src_axis_subsel(x_local, part: SrcPartition,
                                        col_map_local, shard_id,
                                        axis_name: str):
    """Source-axis aggregation under BOTH source partitioning and per-shard
    station sub-selection: halo rows arrive in their sender's station frame
    and are remapped to the receiver's via ``col_map_local``
    (n_shards_send, n_sel+1). The sentinel zero column absorbs stations the
    sender does not carry."""
    n = part.n_shards

    def remap(block, di):
        # offset-d block arrives from sender (shard_id - d) mod n; remap its
        # station columns from the sender's frame to the receiver's
        sender = (shard_id - part.offsets[di]) % n
        cm = col_map_local[sender]                         # (n_sel+1,)
        idx = jnp.broadcast_to(cm[None, :, None],
                               (block.shape[0], cm.shape[0], block.shape[2]))
        return jnp.take_along_axis(block, idx, axis=1)

    halo = halo_exchange(x_local, part, shard_id, axis_name, remap_block=remap)
    x_ext = jnp.concatenate((x_local, halo), axis=0)
    nbr = part.local_nbr[shard_id]
    return x_ext[nbr].mean(axis=1)


def sharded_src_aggregation(x_sorted, part: SrcPartition, mesh: Mesh,
                            axis_name: str = "src", wire_dtype=None):
    """Convenience wrapper: apply the sharded source-axis aggregation to a
    full (n_src_sorted, n_sta, C) tensor laid out over the mesh."""
    from jax import shard_map

    def f(x_local):
        sid = jax.lax.axis_index(axis_name)
        return sharded_gather_mean_src_axis(x_local, part, sid, axis_name,
                                            wire_dtype=wire_dtype)

    fn = shard_map(f, mesh=mesh,
                   in_specs=P(axis_name, None, None),
                   out_specs=P(axis_name, None, None))
    return fn(x_sorted)
