"""Prototype: vectorized XY-cut ordering + block merge + table titles.

Gate (NOTES round-6 backlog #2): attempt the structural refactor iff
this prototype shows >=10% end-to-end single-core upside, byte-identical
on the corpus differential.

Usage: taskset -c 31 python .work/soa_proto.py [n_docs]
Compares old extract_payload vs a monkeypatched variant using the
vectorized element stage, asserts identical page dicts, then interleaved
ABBA timing.
"""
import sys, time, glob, json

sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow.parquet as pq
from pdf_extraction_spark.operators import layout as L


# ---------------------------------------------------------------- new code
def _axis_groups(lo, hi, min_gap):
    """Vectorized _split_axis over one axis of a subset.  Returns None if
    a single merged interval (no split), else list of position arrays in
    ascending-lo interval order, original order preserved within groups
    (matching the dict version's append-in-elems-order)."""
    order = np.argsort(lo, kind="stable")
    slo = lo[order]
    run_max = np.maximum.accumulate(hi[order])
    brk = np.empty(len(order), dtype=bool)
    brk[0] = False
    brk[1:] = slo[1:] > run_max[:-1] + min_gap
    gid_sorted = np.cumsum(brk)
    ng = int(gid_sorted[-1]) + 1
    if ng <= 1:
        return None
    gid = np.empty(len(order), dtype=np.int64)
    gid[order] = gid_sorted
    part = np.argsort(gid, kind="stable")
    counts = np.bincount(gid)
    return np.split(part, np.cumsum(counts)[:-1])


def _xy_order_perm(l, r, b, t):
    """Permutation equivalent of _xy_order over coordinate arrays."""
    n = len(l)
    out = np.empty(n, dtype=np.int64)
    pos = 0
    stack = [(np.arange(n, dtype=np.int64), True, True)]
    while stack:
        idx, try_y, try_x = stack.pop()
        m = len(idx)
        if m <= 1:
            out[pos:pos + m] = idx
            pos += m
            continue
        if try_y:
            groups = _axis_groups(b[idx], t[idx], L.XYCUT_MIN_HGAP)
            if groups is not None:
                for g in groups:  # y groups reversed (top first) = ascending b reversed
                    stack.append((idx[g], False, True))
                # stack pops LIFO: pushing ascending-b leaves the LAST
                # (highest-b = top) group on top -> popped first == the
                # dict version's groups.reverse()
                continue
        if try_x:
            groups = _axis_groups(l[idx], r[idx], L.XYCUT_MIN_VGAP)
            if groups is not None:
                for g in reversed(groups):  # ascending l, popped in order
                    stack.append((idx[g], True, False))
                continue
        order = np.lexsort((l[idx], -t[idx]))
        out[pos:pos + m] = idx[order]
        pos += m
    return out


def _order_and_blocks(elems):
    """elems (list of dicts, same shapes as today) -> ordered list with
    consecutive lines merged to blocks; replaces
    _lines_to_blocks(_xy_order(elems))."""
    n = len(elems)
    if n == 0:
        return []
    coords = np.array(
        [(e["l"], e["r"], e["b"], e["t"]) for e in elems], dtype=np.float64
    )
    perm = (
        _xy_order_perm(coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3])
        if n > 1 else np.zeros(1, dtype=np.int64)
    )
    ordered = [elems[i] for i in perm.tolist()]
    is_line = np.array([e["kind"] == "line" for e in ordered], dtype=bool)
    if not is_line.any():
        return ordered
    base = np.array([e.get("baseline", 0.0) for e in ordered])
    size = np.array([e.get("size", 0.0) for e in ordered])
    merge = np.zeros(n, dtype=bool)
    diff = base[:-1] - base[1:]
    merge[1:] = (
        is_line[1:] & is_line[:-1] & (diff > 0)
        & (diff <= L.BLOCK_GAP_FACTOR * size[1:])
    )
    out = []
    for i, e in enumerate(ordered):
        if merge[i]:
            blk = out[-1]
            blk["text"] += " " + e["text"]
            if e["l"] < blk["l"]:
                blk["l"] = e["l"]
            if e["r"] > blk["r"]:
                blk["r"] = e["r"]
            if e["b"] < blk["b"]:
                blk["b"] = e["b"]
            blk["baseline"] = e["baseline"]
        elif is_line[i]:
            out.append(dict(e, kind="block"))
        else:
            out.append(e)
    return out


def _table_titles(tables, blocks):
    """Vectorized _table_title across all (table, block) pairs."""
    if not tables or not blocks:
        return [None] * len(tables)
    bl = np.array([b["l"] for b in blocks])
    br = np.array([b["r"] for b in blocks])
    bb = np.array([b["b"] for b in blocks])
    tlen = np.array([len(b["text"]) for b in blocks])
    titles = []
    for tb in tables:
        box = tb["bbox"]
        left = np.maximum(bl, box["left"])
        right = np.minimum(br, box["right"])
        width = np.minimum(
            np.maximum(1e-3, br - bl), max(1e-3, box["right"] - box["left"])
        )
        overlap = np.where(right > left, (right - left) / width, 0.0)
        vgap = bb - box["top"]
        ok = (
            (overlap >= L.TITLE_OVERLAP_THRESHOLD)
            & (tlen > 0) & (tlen <= L.TITLE_MAX_CHARS)
            & (vgap >= 0) & (vgap <= L.TITLE_VERTICAL_THRESHOLD)
        )
        if not ok.any():
            titles.append(None)
            continue
        score = np.where(ok, vgap - overlap * L.TITLE_OVERLAP_WEIGHT, np.inf)
        titles.append(blocks[int(score.argmin())]["text"])
    return titles


# ------------------------------------------------------------- harness
def new_order_and_block(ordered_fn=None):
    """Monkeypatch layout's element stage with the vectorized versions."""
    def patched(elems):
        return _order_and_blocks(elems)
    return patched


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    files = sorted(glob.glob("/root/repo/.work/bench_corpus_192000/*.parquet"))
    payloads = []
    for f in files:
        payloads.extend(pq.read_table(f, columns=["html"]).column("html").to_pylist())
        if len(payloads) >= n:
            break
    payloads = payloads[:n]
    print(f"{len(payloads)} docs")

    old_xy, old_blk, old_title = L._xy_order, L._lines_to_blocks, L._table_title

    def run_old(docs):
        L._xy_order, L._lines_to_blocks, L._table_title = old_xy, old_blk, old_title
        t0 = time.perf_counter()
        res = [L.extract_payload(p) for p in docs]
        return time.perf_counter() - t0, res

    def run_new(docs):
        # compose: _lines_to_blocks(_xy_order(e)) == _order_and_blocks(e)
        L._xy_order = lambda e: e  # identity; ordering happens in blocks step
        L._lines_to_blocks = _order_and_blocks
        def title_one(tb, blocks):
            # keep per-call signature; vectorize inside across blocks
            return _table_titles([{"bbox": tb}], blocks)[0]
        L._table_title = title_one
        t0 = time.perf_counter()
        res = [L.extract_payload(p) for p in docs]
        t = time.perf_counter() - t0
        L._xy_order, L._lines_to_blocks, L._table_title = old_xy, old_blk, old_title
        return t, res

    # equivalence first
    _, a = run_old(payloads)
    _, b = run_new(payloads)
    mism = sum(1 for x, y in zip(a, b) if x != y)
    print(f"equivalence: {len(a) - mism}/{len(a)} identical")
    if mism:
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print("FIRST MISMATCH doc", i)
                for px, py in zip(x, y):
                    if px != py:
                        for k in px:
                            if px[k] != py.get(k):
                                print(" key", k)
                                print("  old:", json.dumps(px[k])[:400])
                                print("  new:", json.dumps(py.get(k))[:400])
                        break
                break
        return 1

    # interleaved ABBA timing
    walls = {"old": [], "new": []}
    for rnd in range(4):
        seq = ("old", "new") if rnd % 2 == 0 else ("new", "old")
        for which in seq:
            t, _ = (run_old if which == "old" else run_new)(payloads)
            walls[which].append(t)
    for k, v in walls.items():
        v = sorted(v)
        print(f"{k}: median {v[len(v)//2]:.3f}s  all {[round(x,3) for x in v]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
