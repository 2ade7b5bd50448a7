"""Offline simulation of pk-tile packing schemes (no TPU needed).

Estimates subtile counts for candidate placement encodings against the
real bench graph, to decide which kernel changes are worth making.

Schemes:
  v2       — current: 64-slot group chunks (partial-filled) + <=8-edge
             lane chunks; 1 group placement + 1 lane placement per word
             per tile.
  pfxsfx   — full 64-groups only; remainders become 8-slot-aligned
             partial chunks placed as prefix/suffix pairs inside 8-lane
             blocks; K group placements per word per tile.
Options:
  hub_route — hub cell remainders (< HUB_T) flow into the packed tiles
  dual_row  — tiles may span two output rows (supercell tail merge)
"""
import sys
import numpy as np
from collections import defaultdict

REGION = 32768
HUB_T = 512
TILE_E = 1024
BLOCKS = 15          # 8-lane blocks usable per tile (lanes 0..119)


def load(scale=20):
    d = np.load(f'.bench_cache/rmat_s{scale}_e16_u1_v0_d1_seed42.npz')
    ro, ci = d['row_offsets'], d['col_indices']
    n = len(ro) - 1
    sys.path.insert(0, '.')
    from gunrockinst_tpu.graph.csr import CsrGraph
    csc = CsrGraph(ro, ci).transposed()
    return csc.row_offsets, csc.col_indices, n


def cells(ro, ci, n):
    m = len(ci)
    dst = np.repeat(np.arange(n, dtype=np.int64), np.diff(ro))
    src = ci.astype(np.int64)
    region = src // REGION
    word = dst // 32
    order = np.lexsort((word, region))
    region, word = region[order], word[order]
    change = np.ones(m, bool)
    change[1:] = (region[1:] != region[:-1]) | (word[1:] != word[:-1])
    start = np.nonzero(change)[0]
    cnt = np.diff(np.append(start, m))
    return region[start], word[start], cnt


def sim_v2(creg, cword, ccnt):
    """Reproduce current packer's tile count (approximately — the real
    packer defers conflicting chunks; here we count block demand per
    supercell and divide by capacity, which matches closely)."""
    hub = ccnt >= HUB_T
    hub_tiles = int(np.ceil(ccnt[hub] / TILE_E).sum())
    # packed: group chunks (64-slot blocks, partial filled) + lane chunks
    per_super_blocks = defaultdict(int)
    per_super_lanes = defaultdict(int)
    max_cls = defaultdict(int)   # per-word group-chunk count forces tiles
    for r, w, c in zip(creg[~hub], cword[~hub], ccnt[~hub]):
        sk = (r, w // 128)
        g = 0
        off = 0
        while c - off >= 8:
            take = min(64, c - off)
            off += take
            g += 1
        per_super_blocks[sk] += g
        if c - off > 0:
            per_super_lanes[sk] += 1
        max_cls[sk] = max(max_cls[sk], g)
    pk_tiles = 0
    for sk in set(per_super_blocks) | set(per_super_lanes):
        b = per_super_blocks.get(sk, 0)
        l = per_super_lanes.get(sk, 0)
        # each tile: up to 15 blocks for groups, leftover block-lanes for
        # lane chunks (8 lanes per unused block); a word's g chunks need
        # g distinct tiles
        t = max(int(np.ceil((b + l / 8) / BLOCKS)), max_cls.get(sk, 0))
        pk_tiles += t
    return hub_tiles, pk_tiles


def sim_pfxsfx(creg, cword, ccnt, group_slots=2, hub_route=True,
               dual_row=False):
    hub_tiles = 0
    # per supercell: full64 group-chunk count, partial lane demand
    per_super_g = defaultdict(int)
    per_super_plane = defaultdict(int)   # partial lanes (1..7 per word)
    per_super_maxg = defaultdict(int)
    for r, w, c in zip(creg, cword, ccnt):
        if c >= HUB_T:
            full = c // TILE_E
            rem = c % TILE_E
            hub_tiles += full
            if not hub_route:
                if rem:
                    hub_tiles += 1
                continue
            if rem >= HUB_T:
                hub_tiles += 1
                continue
            c = rem                     # remainder flows to packed
            if c == 0:
                continue
        sk = (r, w // 128) if not dual_row else (r,)
        g, rr = divmod(c, 64)
        pl = (rr + 7) // 8
        if pl == 8:
            g, pl = g + 1, 0
        per_super_g[sk] += g
        per_super_plane[sk] += pl
        per_super_maxg[sk] = max(per_super_maxg[sk],
                                 (g + group_slots - 1) // group_slots)
    pk_tiles = 0
    for sk in set(per_super_g) | set(per_super_plane):
        g = per_super_g.get(sk, 0)
        pl = per_super_plane.get(sk, 0)
        blocks_needed = g + pl / 8.0    # partials pack ~2/block w/ pairing
        t = max(int(np.ceil(blocks_needed / BLOCKS)),
                per_super_maxg.get(sk, 0))
        pk_tiles += t
    return hub_tiles, pk_tiles


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ro, ci, n = load(scale)
    m = len(ci)
    creg, cword, ccnt = cells(ro, ci, n)
    print(f"n={n} m={m} cells={len(ccnt)} "
          f"(median {int(np.median(ccnt))}, mean {ccnt.mean():.1f})")
    for name, fn in [
        ("v2 (current)", lambda: sim_v2(creg, cword, ccnt)),
        ("pfxsfx g1", lambda: sim_pfxsfx(creg, cword, ccnt, 1)),
        ("pfxsfx g2", lambda: sim_pfxsfx(creg, cword, ccnt, 2)),
        ("pfxsfx g2 nohubroute",
         lambda: sim_pfxsfx(creg, cword, ccnt, 2, hub_route=False)),
        ("pfxsfx g2 dualrow",
         lambda: sim_pfxsfx(creg, cword, ccnt, 2, dual_row=True)),
        ("pfxsfx g3 dualrow",
         lambda: sim_pfxsfx(creg, cword, ccnt, 3, dual_row=True)),
    ]:
        h, p = fn()
        tot = h + p
        print(f"{name:24s} hub={h:6d} pk={p:6d} total={tot:6d} "
              f"bytes/sweep={tot*4096/1e6:7.1f}MB "
              f"util={m/(tot*1024):.3f}")


if __name__ == "__main__":
    main()
