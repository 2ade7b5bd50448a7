"""Boundary-exchange distributed primitives: dst-owned partitioning.

`parallel/dist.py` replicates vertex state and all-reduces full
(n_pad,) int32 vectors every level — O(4n) bytes on ICI per device per
iteration regardless of frontier size.  This module implements the
blueprint's boundary-vertex exchange (SURVEY.md §5.8; the layer the
reference left stubbed at app/problem_base.cuh:186-210,336) the TPU
way:

  * vertices are range-partitioned by DESTINATION: device d owns dst
    range [d*n_loc, (d+1)*n_loc) and ALL in-edges of those dsts, so
    label/distance/rank updates for owned vertices complete locally —
    no scatter crosses ICI, ever.
  * the only per-level exchange is the next-frontier BITMAP: each
    device packs its owned `new` bits into n_loc/32 words and
    `all_gather`s the slices into the replicated frontier word map.
    Per-device ICI egress = n/32/d words = n/(8d) bytes per level —
    a 32x reduction over one replicated int32 vector, 96x over
    dist.py's three — and the psum'd per-level byte model is reported
    by scaling_bench.py.

Determinism matches the single-chip primitives: scatter-min/max/add
with min-vertex-id tie-breaks, shard-count-invariant by construction
(each dst's in-edges all live on one device).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from gunrockinst_tpu.graph.csr import CsrGraph
from gunrockinst_tpu.parallel.mesh import EDGE_AXIS

INT_MAX = jnp.iinfo(jnp.int32).max


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DstShardedGraph:
    """Edges partitioned by destination ownership.

    Shard-major layout: arrays are (d * m_loc,) with device k's edges
    in [k*m_loc, (k+1)*m_loc), sharded P('e').  Dummy-padded with
    (n -> n) edges (src n is never in a frontier; dst n maps to local
    dummy slot n_loc-1 of the owner of n's range)."""

    n: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    n_loc: int = dataclasses.field(metadata=dict(static=True))   # per-dev
    m_loc: int = dataclasses.field(metadata=dict(static=True))   # per-dev
    n_devices: int = dataclasses.field(metadata=dict(static=True))

    edge_src: jax.Array    # (d*m_loc,) GLOBAL src ids, P('e')
    edge_dst_l: jax.Array  # (d*m_loc,) LOCAL dst ids [0, n_loc), P('e')
    edge_w: jax.Array      # (d*m_loc,) f32, P('e')
    out_degree: jax.Array  # (d*n_loc,) int32 out-degree of owned verts

    @property
    def n_pad(self) -> int:
        return self.n_loc * self.n_devices

    @property
    def n_words(self) -> int:
        return self.n_pad // 32


def shard_graph_by_dst(csr: CsrGraph, mesh: Mesh) -> DstShardedGraph:
    """Partition a host CSR by dst range over the mesh.  n_loc is
    lane-and-word aligned (multiple of 128*32 = 4096) so each device's
    frontier slice packs to whole (sub-lane-aligned) words."""
    d = mesh.shape[EDGE_AXIS]
    n, m = csr.num_nodes, csr.num_edges
    n_loc = -(-(n + 1) // (4096 * d)) * 4096
    n_pad = n_loc * d

    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(csr.row_offsets))
    dst = csr.col_indices.astype(np.int64)
    w = (csr.edge_values.astype(np.float32) if csr.edge_values is not None
         else np.ones(m, np.float32))

    owner = dst // n_loc
    order = np.argsort(owner, kind="stable")
    src, dst, w, owner = src[order], dst[order], w[order], owner[order]
    counts = np.bincount(owner, minlength=d)
    m_loc = -(-max(int(counts.max()), 1) // 128) * 128

    es = np.full((d, m_loc), n, np.int32)          # dummy src = n
    ed = np.full((d, m_loc), n_loc - 1, np.int32)  # local dummy slot
    ew = np.zeros((d, m_loc), np.float32)
    off = 0
    for k in range(d):
        c = int(counts[k])
        es[k, :c] = src[off: off + c]
        ed[k, :c] = (dst[off: off + c] - k * n_loc)
        ew[k, :c] = w[off: off + c]
        off += c

    deg = np.zeros(n_pad, np.int32)
    deg[:n] = np.diff(csr.row_offsets)

    eshard = NamedSharding(mesh, P(EDGE_AXIS))
    return DstShardedGraph(
        n=n, m=m, n_loc=n_loc, m_loc=m_loc, n_devices=d,
        edge_src=jax.device_put(es.reshape(-1), eshard),
        edge_dst_l=jax.device_put(ed.reshape(-1), eshard),
        edge_w=jax.device_put(ew.reshape(-1), eshard),
        out_degree=jax.device_put(deg, eshard),
    )


def _pack_words(bits, n_words_loc: int):
    """(n_loc,) bool -> (n_words_loc,) int32 little-endian bit words."""
    b = bits.reshape(n_words_loc, 32).astype(jnp.int32)
    sh = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(b << sh[None, :], axis=1, dtype=jnp.int32)


def _frontier_bit(words, vids):
    """Replicated word map -> per-edge frontier bit for GLOBAL ids."""
    return (words[vids >> 5] >> (vids & 31)) & 1


def bfs_dist_words(graph: DstShardedGraph, src: int, mesh: Mesh,
                   mark_preds: bool = True):
    """Distributed BFS with bitmap-only boundary exchange.

    Per level, per device: gather frontier bits for local edges' srcs
    from the replicated word map, scatter-max into OWNED dst labels
    (purely local), pack owned `new` bits to words, all_gather the
    word slices.  Returns (labels (n_pad,) [owner-gathered at the end],
    preds, depth, ici_bytes: modeled per-device ICI egress)."""
    n_loc, n_words = graph.n_loc, graph.n_words
    nwl = n_loc // 32
    d = graph.n_devices

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P()),
        out_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(), P()),
        check_rep=False)
    def search(esrc, edst_l, src_v):
        # local slice id of this device = owner of its dst range
        me = jax.lax.axis_index(EDGE_AXIS)
        s = src_v[0]
        own_src = (s // n_loc) == me
        labels0 = jnp.full((n_loc,), INT_MAX, jnp.int32)
        labels0 = jnp.where(
            (jnp.arange(n_loc) == (s % n_loc)) & own_src, 0, labels0)
        preds0 = jnp.full((n_loc,), -1, jnp.int32)
        fw0 = jnp.zeros((n_words,), jnp.int32).at[s >> 5].set(
            jnp.int32(1) << (s & 31))

        def cond(c):
            labels, preds, fw, depth, traffic = c
            return jnp.any(fw != 0) & (depth <= graph.n)

        def body(c):
            labels, preds, fw, depth, traffic = c
            active = _frontier_bit(fw, esrc).astype(jnp.bool_)
            cand = active & (labels[edst_l] == INT_MAX)
            touched = jnp.zeros((n_loc,), jnp.bool_).at[edst_l].max(cand)
            newf = touched & (labels == INT_MAX)
            labels = jnp.where(newf, depth + 1, labels)
            if mark_preds:
                pmin = jnp.full((n_loc,), INT_MAX, jnp.int32).at[
                    edst_l].min(jnp.where(cand, esrc, INT_MAX))
                preds = jnp.where(newf, pmin, preds)
            # the ONLY cross-device exchange: owned new-frontier words
            nw_local = _pack_words(newf, nwl)
            fw = jax.lax.all_gather(
                nw_local, EDGE_AXIS, tiled=True)      # (n_words,)
            return labels, preds, fw, depth + 1, traffic + nwl * 4

        labels, preds, fw, depth, traffic = jax.lax.while_loop(
            cond, body, (labels0, preds0, fw0, jnp.int32(0),
                         jnp.int32(0)))
        return labels, preds, depth[None], traffic[None]

    labels, preds, depth, traffic = jax.jit(search)(
        graph.edge_src, graph.edge_dst_l,
        jnp.asarray([src], dtype=jnp.int32))
    return labels, preds, int(depth[0]), int(traffic[0])


def dobfs_dist_words(graph: DstShardedGraph, src: int, mesh: Mesh,
                     alpha: float = 6.0, beta: float = 2.0,
                     mark_preds: bool = True):
    """Distributed direction-optimized BFS with a REAL pull mechanism
    (round-2 verdict: the dist_more.py switch picked a flag but ran the
    identical edge-centric advance either way).

    Here the two directions are structurally different computations,
    mirroring the reference's forward/backward kernel split
    (oprtr/edge_map_forward vs edge_map_backward/cta.cuh:91-331):

      * push — frontier-side: gather frontier bits for edge SOURCES,
        scatter-max/min into owned dsts (the bfs_dist_words advance).
      * pull — unvisited-owner side: every device segment-reduces over
        the in-edges of its OWNED dsts (min frontier parent per dst via
        `segment_min`), masked to its unvisited dsts — no scatter at
        all, exactly the backward kernel's "scan my in-edges, claim if
        a parent is lit" shape.  Work scales with sum(indeg[unvisited])
        instead of sum(outdeg[frontier]).

    The Beamer switch compares those two replicated scan volumes
    (alpha-weighted, dobfs_enactor.cuh:397).  Both directions exchange
    the same owned next-frontier words (n_loc/8 B/device/level) — with
    dst-owned partitioning the pull saving is local scan volume, not
    ICI bytes.  Labels AND preds stay bitwise equal to bfs_dist_words
    (min-id tie-break holds in both directions), so the switch is
    semantically invisible, as in the reference.

    Returns (labels, preds, depth, pull_levels, ici_bytes/device)."""
    n_loc, n_words = graph.n_loc, graph.n_words
    nwl = n_loc // 32

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P()),
        out_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(), P(), P()),
        check_rep=False)
    def search(esrc, edst_l, outdeg_own, src_v):
        me = jax.lax.axis_index(EDGE_AXIS)
        s = src_v[0]
        own_src = (s // n_loc) == me
        lid = jnp.arange(n_loc, dtype=jnp.int32)
        labels0 = jnp.where((lid == (s % n_loc)) & own_src, 0, INT_MAX)
        preds0 = jnp.full((n_loc,), -1, jnp.int32)
        fw0 = jnp.zeros((n_words,), jnp.int32).at[s >> 5].set(
            jnp.int32(1) << (s & 31))
        # in-degree of owned dsts (dummy edges excluded)
        indeg_own = jnp.zeros((n_loc,), jnp.int32).at[edst_l].add(
            jnp.where(esrc != graph.n, 1, 0))

        def cond(c):
            labels, preds, fw, depth, pulls, traffic = c
            return jnp.any(fw != 0) & (depth <= graph.n)

        def body(c):
            labels, preds, fw, depth, pulls, traffic = c
            unvis = labels == INT_MAX
            # replicated switch stats: alpha-weighted scan volumes
            own_w = jax.lax.dynamic_slice(fw, (me * nwl,), (nwl,))
            fbit = ((own_w[lid >> 5] >> (lid & 31)) & 1) == 1
            f_edges = jax.lax.psum(
                jnp.sum(jnp.where(fbit, outdeg_own, 0)), EDGE_AXIS)
            u_edges = jax.lax.psum(
                jnp.sum(jnp.where(unvis, indeg_own, 0)), EDGE_AXIS)
            use_pull = f_edges * alpha > u_edges.astype(jnp.float32)

            def push(_):
                active = _frontier_bit(fw, esrc).astype(jnp.bool_)
                cand = active & unvis[edst_l]
                touched = jnp.zeros((n_loc,), jnp.bool_).at[
                    edst_l].max(cand)
                pmin = jnp.full((n_loc,), INT_MAX, jnp.int32).at[
                    edst_l].min(jnp.where(cand, esrc, INT_MAX))
                return touched, pmin

            def pull(_):
                # per OWNED dst: min frontier in-parent, no scatter
                pv = jnp.where(_frontier_bit(fw, esrc) == 1,
                               esrc, INT_MAX)
                seg = jax.ops.segment_min(pv, edst_l,
                                          num_segments=n_loc)
                pmin = jnp.where(unvis, seg, INT_MAX)
                return pmin != INT_MAX, pmin

            touched, pmin = jax.lax.cond(use_pull, pull, push, None)
            newf = touched & unvis
            labels = jnp.where(newf, depth + 1, labels)
            if mark_preds:
                preds = jnp.where(newf, pmin, preds)
            fw = jax.lax.all_gather(_pack_words(newf, nwl),
                                    EDGE_AXIS, tiled=True)
            return (labels, preds, fw, depth + 1,
                    pulls + use_pull.astype(jnp.int32),
                    traffic + nwl * 4)

        labels, preds, fw, depth, pulls, traffic = jax.lax.while_loop(
            cond, body, (labels0, preds0, fw0, jnp.int32(0),
                         jnp.int32(0), jnp.int32(0)))
        return labels, preds, depth[None], pulls[None], traffic[None]

    labels, preds, depth, pulls, traffic = jax.jit(search)(
        graph.edge_src, graph.edge_dst_l, graph.out_degree,
        jnp.asarray([src], dtype=jnp.int32))
    return (labels, preds, int(depth[0]), int(pulls[0]),
            int(traffic[0]))


def sssp_dist_words(graph: DstShardedGraph, src: int, mesh: Mesh):
    """Distributed SSSP: local scatter-min relaxations into owned
    distances, then all_gather of the owned DISTANCE slices (each
    device sends n_loc*4 bytes — d-fold less than dist.py's replicated
    pmin).  Bitwise equal to the single-chip Bellman fixpoint."""
    n_loc = graph.n_loc
    n_pad = graph.n_pad

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P()),
        out_specs=(P(EDGE_AXIS), P(), P()),
        check_rep=False)
    def search(esrc, edst_l, w, src_v):
        inf = jnp.float32(jnp.inf)
        s = src_v[0]
        dist_g0 = jnp.full((n_pad,), inf).at[s].set(0.0)

        def cond(c):
            dist_g, changed, it, traffic = c
            return changed & (it < 4 * graph.n + 8)

        def body(c):
            dist_g, _, it, traffic = c
            vals = dist_g[esrc] + w
            vals = jnp.where(esrc == graph.n, inf, vals)  # dummy edges
            relaxed = jnp.full((n_loc,), inf).at[edst_l].min(vals)
            me = jax.lax.axis_index(EDGE_AXIS)
            own = jax.lax.dynamic_slice(dist_g, (me * n_loc,), (n_loc,))
            new_own = jnp.minimum(own, relaxed)
            changed = jnp.any(new_own < own)
            # exchange: owned distance slices only
            dist_g = jax.lax.all_gather(new_own, EDGE_AXIS, tiled=True)
            changed = jax.lax.pmax(changed.astype(jnp.int32),
                                   EDGE_AXIS) > 0
            return dist_g, changed, it + 1, traffic + n_loc * 4

        dist_g, _, it, traffic = jax.lax.while_loop(
            cond, body, (dist_g0, jnp.bool_(True), jnp.int32(0),
                         jnp.int32(0)))
        me = jax.lax.axis_index(EDGE_AXIS)
        own = jax.lax.dynamic_slice(dist_g, (me * n_loc,), (n_loc,))
        return own, it[None], traffic[None]

    dist, it, traffic = jax.jit(search)(
        graph.edge_src, graph.edge_dst_l, graph.edge_w,
        jnp.asarray([src], dtype=jnp.int32))
    return dist, int(it[0]), int(traffic[0])


def cc_dist_words(graph: DstShardedGraph, mesh: Mesh):
    """Distributed CC: min-label propagation with owned-slice exchange.

    Pass a SYMMETRIZED graph (weak connectivity; shard_graph_by_dst of
    the undirected edge set).  Per round, per device: candidates only
    from sources whose label changed last round (changed-word gating,
    exact — min is monotone), scatter-min into owned labels (local),
    then all_gather of owned label slices + owned changed words.
    Per-device egress = n_loc*4 + n_loc/8 bytes per round; after the
    wave passes a device's range its changed words go quiet and peers'
    gathers of its slice still cost, so the byte model counts both.
    Converges to min vertex id per component, matching cc_reference.
    Returns (comp_own (n_loc,) per device [P('e') stacked], rounds,
    ici_bytes/device)."""
    n_loc, n_pad = graph.n_loc, graph.n_pad
    nwl = n_loc // 32

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=(P(EDGE_AXIS), P(), P()),
        check_rep=False)
    def search(esrc, edst_l):
        comp_g0 = jnp.arange(n_pad, dtype=jnp.int32)
        cw0 = jnp.full((graph.n_words,), -1, jnp.int32)

        def cond(c):
            comp_g, cw, it, traffic = c
            return jnp.any(cw != 0) & (it < graph.n + 2)

        def body(c):
            comp_g, cw, it, traffic = c
            active = _frontier_bit(cw, esrc).astype(jnp.bool_)
            cand = jnp.where(active & (esrc != graph.n),
                             comp_g[esrc], INT_MAX)
            relaxed = jnp.full((n_loc,), INT_MAX, jnp.int32).at[
                edst_l].min(cand)
            me = jax.lax.axis_index(EDGE_AXIS)
            own = jax.lax.dynamic_slice(comp_g, (me * n_loc,), (n_loc,))
            new_own = jnp.minimum(own, relaxed)
            changed_own = new_own < own
            comp_g = jax.lax.all_gather(new_own, EDGE_AXIS, tiled=True)
            cw = jax.lax.all_gather(_pack_words(changed_own, nwl),
                                    EDGE_AXIS, tiled=True)
            return comp_g, cw, it + 1, traffic + n_loc * 4 + nwl * 4

        comp_g, cw, it, traffic = jax.lax.while_loop(
            cond, body, (comp_g0, cw0, jnp.int32(0), jnp.int32(0)))
        me = jax.lax.axis_index(EDGE_AXIS)
        own = jax.lax.dynamic_slice(comp_g, (me * n_loc,), (n_loc,))
        return own, it[None], traffic[None]

    comp, it, traffic = jax.jit(search)(graph.edge_src, graph.edge_dst_l)
    return comp, int(it[0]), int(traffic[0])


def bc_dist_words(csr: CsrGraph, src: int, mesh: Mesh):
    """Distributed betweenness centrality with word exchange in BOTH
    passes.  Forward (Brandes sigma counts) runs on the dst-owned
    partition: sigma updates for owned dsts are local, exchange =
    owned sigma slices + frontier words per level.  Backward (delta
    dependency accumulation) accumulates into SOURCES, so it runs on a
    second, SRC-owned copy of the edges (each src's out-edges on its
    owner — the reference keeps both CSR and CSC for the same reason);
    exchange = owned delta slices per level.  Matches the single-chip
    bc (deterministic scatter-adds), ici_bytes models per-device
    egress across both passes.
    Returns (bc (n,) np.float32, depth, ici_bytes/device)."""
    g = shard_graph_by_dst(csr, mesh)
    n_loc, n_pad, n_words = g.n_loc, g.n_pad, g.n_words
    nwl = n_loc // 32
    d = g.n_devices
    n = csr.num_nodes

    # src-owned shard for the backward pass: same ownership ranges
    esrc_h = np.repeat(np.arange(n, dtype=np.int64),
                       np.diff(csr.row_offsets))
    edst_h = csr.col_indices.astype(np.int64)
    owner = esrc_h // n_loc
    order = np.argsort(owner, kind="stable")
    s_s, s_d, s_o = esrc_h[order], edst_h[order], owner[order]
    counts = np.bincount(s_o, minlength=d)
    m_loc2 = -(-max(int(counts.max()), 1) // 128) * 128
    bs = np.full((d, m_loc2), n_loc - 1, np.int32)  # local dummy src
    bd = np.full((d, m_loc2), g.n, np.int32)        # global dummy dst
    off = 0
    for k in range(d):
        c = int(counts[k])
        bs[k, :c] = s_s[off: off + c] - k * n_loc
        bd[k, :c] = s_d[off: off + c]
        off += c
    eshard = NamedSharding(mesh, P(EDGE_AXIS))
    bsrc_l = jax.device_put(bs.reshape(-1), eshard)
    bdst_g = jax.device_put(bd.reshape(-1), eshard)

    MAXD = 64  # forward-level cap (power-law diameters; asserted below)
    GN = g.n

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                  P(EDGE_AXIS), P()),
        out_specs=(P(EDGE_AXIS), P(), P()),
        check_rep=False)
    def run(esrc, edst_l, bsrc_loc, bdst_glob, src_v):
        me = jax.lax.axis_index(EDGE_AXIS)
        s = src_v[0]
        own_src = (s // n_loc) == me
        lid = jnp.arange(n_loc, dtype=jnp.int32)
        labels0 = jnp.where((lid == (s % n_loc)) & own_src, 0, INT_MAX)
        sigma_own0 = jnp.where((lid == (s % n_loc)) & own_src,
                               1.0, 0.0)
        sigma_g0 = jax.lax.all_gather(sigma_own0, EDGE_AXIS, tiled=True)
        fw0 = jnp.zeros((n_words,), jnp.int32).at[s >> 5].set(
            jnp.int32(1) << (s & 31))

        # ---- forward: levels of sigma accumulation ----
        def fcond(c):
            labels, sigma_g, fw, depth, traffic = c
            return jnp.any(fw != 0) & (depth < MAXD)

        def fbody(c):
            labels, sigma_g, fw, depth, traffic = c
            active = _frontier_bit(fw, esrc).astype(jnp.bool_)
            cand = active & (labels[edst_l] == INT_MAX)
            touched = jnp.zeros((n_loc,), jnp.bool_).at[edst_l].max(cand)
            newf = touched & (labels == INT_MAX)
            labels = jnp.where(newf, depth + 1, labels)
            part = jnp.zeros((n_loc,), jnp.float32).at[edst_l].add(
                jnp.where(cand, sigma_g[esrc], 0.0))
            sig_own = jax.lax.dynamic_slice(
                sigma_g, (me * n_loc,), (n_loc,))
            sig_own = jnp.where(newf, part, sig_own)
            sigma_g = jax.lax.all_gather(sig_own, EDGE_AXIS, tiled=True)
            fw = jax.lax.all_gather(_pack_words(newf, nwl),
                                    EDGE_AXIS, tiled=True)
            return (labels, sigma_g, fw, depth + 1,
                    traffic + nwl * 4 + n_loc * 4)

        labels, sigma_g, fw, depth, traffic = jax.lax.while_loop(
            fcond, fbody, (labels0, sigma_g0, fw0, jnp.int32(0),
                           jnp.int32(0)))

        # ---- backward: delta accumulation on the src-owned shard ----
        labels_g = jax.lax.all_gather(labels, EDGE_AXIS, tiled=True)
        traffic = traffic + n_loc * 4   # one labels exchange
        delta_g0 = jnp.zeros((n_pad,), jnp.float32)
        lsrc_g = labels_g[me * n_loc + bsrc_loc]   # static per level
        ldst_g = jnp.where(bdst_glob == GN,
                           INT_MAX, labels_g[jnp.minimum(bdst_glob,
                                                         n_pad - 1)])
        sig_src = sigma_g[me * n_loc + bsrc_loc]
        sig_dst = sigma_g[jnp.minimum(bdst_glob, n_pad - 1)]
        ratio = jnp.where(sig_dst > 0, sig_src / jnp.maximum(
            sig_dst, 1.0), 0.0)

        def bcond(c):
            delta_g, lvl, traffic = c
            return lvl >= 0

        def bbody(c):
            delta_g, lvl, traffic = c
            on = (lsrc_g == lvl) & (ldst_g == lvl + 1)
            contrib = jnp.where(on, ratio * (1.0 + delta_g[
                jnp.minimum(bdst_glob, n_pad - 1)]), 0.0)
            part = jnp.zeros((n_loc,), jnp.float32).at[bsrc_loc].add(
                contrib)
            d_own = jax.lax.dynamic_slice(
                delta_g, (me * n_loc,), (n_loc,))
            d_own = d_own + part
            delta_g = jax.lax.all_gather(d_own, EDGE_AXIS, tiled=True)
            return delta_g, lvl - 1, traffic + n_loc * 4

        delta_g, _, traffic = jax.lax.while_loop(
            bcond, bbody, (delta_g0, depth - 1, traffic))
        d_own = jax.lax.dynamic_slice(delta_g, (me * n_loc,), (n_loc,))
        # Brandes excludes the source's own dependency (bc.py:89)
        own_src = (s // n_loc) == me
        d_own = jnp.where((lid == (s % n_loc)) & own_src, 0.0, d_own)
        return d_own, depth[None], traffic[None]

    delta, depth, traffic = jax.jit(run)(
        g.edge_src, g.edge_dst_l, bsrc_l, bdst_g,
        jnp.asarray([src], dtype=jnp.int32))
    assert int(depth[0]) < MAXD, "bc_dist_words: depth exceeded MAXD"
    bc = np.asarray(delta)[:n] * 0.5
    return bc.astype(np.float32), int(depth[0]), int(traffic[0])


def pagerank_dist_words(graph: DstShardedGraph, mesh: Mesh,
                        delta: float = 0.85, threshold: float = 0.01,
                        max_iter: int = 50):
    """Distributed Gunrock-semantics PageRank: owned-dst partial sums
    complete locally; one all_gather of the owned rank slices per
    iteration (n_loc*4 B egress per device vs dist.py's full-vector
    psum)."""
    n_loc, n_pad = graph.n_loc, graph.n_pad
    n = graph.n

    nwl = n_loc // 32

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=(P(EDGE_AXIS), P()),
        check_rep=False)
    def pr(esrc, edst_l, deg_own):
        me = jax.lax.axis_index(EDGE_AXIS)
        gid = me * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
        real_own = gid < n
        # global degree map for src-side contrib reads (one-time)
        deg_g = jax.lax.all_gather(deg_own, EDGE_AXIS, tiled=True)
        degf_g = jnp.maximum(deg_g.astype(jnp.float32), 1.0)
        real_g = jnp.arange(n_pad, dtype=jnp.int32) < n
        rank_g0 = jnp.where(real_g, 1.0 - delta, 0.0)
        aw0 = jax.lax.all_gather(
            _pack_words((deg_own > 0) & real_own, nwl),
            EDGE_AXIS, tiled=True)

        def cond(c):
            rank_g, aw, it, traffic = c
            return jnp.any(aw != 0) & (it < max_iter)

        def body(c):
            rank_g, aw, it, traffic = c
            contrib_g = jnp.where(deg_g > 0, rank_g / degf_g, 0.0)
            active_src = _frontier_bit(aw, esrc).astype(jnp.bool_)
            ok = active_src & (deg_g[esrc] > 0) & (esrc != graph.n)
            part = jnp.zeros((n_loc,), jnp.float32).at[edst_l].add(
                jnp.where(ok, contrib_g[esrc], 0.0))
            part = jnp.where(deg_own > 0, part, 0.0)  # dead-end filter
            nxt_own = jnp.where(real_own,
                                delta * part + (1.0 - delta), 0.0)
            old_own = jax.lax.dynamic_slice(rank_g, (me * n_loc,),
                                            (n_loc,))
            act_own = (jnp.abs(nxt_own - old_own) > threshold) & real_own
            # exchange: owned rank slice + owned active words
            rank_g = jax.lax.all_gather(nxt_own, EDGE_AXIS, tiled=True)
            aw = jax.lax.all_gather(_pack_words(act_own, nwl),
                                    EDGE_AXIS, tiled=True)
            return rank_g, aw, it + 1, traffic + n_loc * 4 + nwl * 4

        rank_g, _, it, traffic = jax.lax.while_loop(
            cond, body, (rank_g0, aw0, jnp.int32(0), jnp.int32(0)))
        own = jax.lax.dynamic_slice(rank_g, (me * n_loc,), (n_loc,))
        return own, traffic[None]

    rank, traffic = jax.jit(pr)(graph.edge_src, graph.edge_dst_l,
                                graph.out_degree)
    return rank, int(traffic[0])
