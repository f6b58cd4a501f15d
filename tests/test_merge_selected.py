"""merge_selected_clumps vs a literal transcription of
RSGISMergeSegments.cpp:63 (mergeSelectedClumps), including the
calcDist assignment quirk and the derived-numPxls quirk."""

import numpy as np
import pyarrow as pa
import pytest
import ray


def _brute(fid_grid, b1_grid, b2_grid, selected, nodata):
    n_rows, n_cols = fid_grid.shape
    labels = np.unique(fid_grid)
    sums1 = {int(l): int(b1_grid[fid_grid == l].sum()) for l in labels}
    sums2 = {int(l): int(b2_grid[fid_grid == l].sum()) for l in labels}
    cnt = {int(l): int((fid_grid == l).sum()) for l in labels}
    nbrs = {int(l): set() for l in labels}
    for r in range(n_rows):
        for c in range(n_cols):
            for dr, dc in ((0, 1), (1, 0)):
                rr, cc = r + dr, c + dc
                if rr < n_rows and cc < n_cols:
                    a, b = int(fid_grid[r, c]), int(fid_grid[rr, cc])
                    if a != b:
                        nbrs[a].add(b)
                        nbrs[b].add(a)
    mean1 = {l: sums1[l] / cnt[l] for l in nbrs}
    mean2 = {l: sums2[l] / cnt[l] for l in nbrs}
    npx = {l: sums1[l] / mean1[l] for l in nbrs}  # derived quirk
    s2 = {l: float(sums2[l]) for l in nbrs}
    removed = set()
    members = {l: [l] for l in nbrs}
    while True:
        merges = []
        for l in sorted(nbrs):
            if not selected.get(l, False) or l in removed:
                continue
            best, bd = None, None
            for t in sorted(nbrs[l]):
                if (selected.get(t, False) or t in removed
                        or nodata.get(t, False)):
                    continue
                diff = mean2[l] - mean2[t]
                d = np.sqrt((diff * diff) / 2)  # calcDist quirk
                if bd is None or d < bd:
                    best, bd = t, d
            if best is not None:
                merges.append((l, best))
        if not merges:
            break
        for l, t in merges:
            removed.add(l)
            members[t].append(l)
            s2[t] += s2[l]
            npx[t] += npx[l]
            mean2[t] = s2[t] / npx[t]
            nbrs[t] |= {x for x in nbrs[l] if x != t}
            nbrs[t].discard(l)
    out = {}
    for surv, ms in members.items():
        if surv in removed:
            continue
        oid = 0 if nodata.get(surv, False) else surv
        for m in ms:
            out[m] = (oid, mean2[surv])
    return out


@pytest.mark.parametrize("parts", [2, 8])
def test_merge_selected_vs_brute(ray_session, parts):
    from rsgislib_ray.stages.segmentation import merge_selected_clumps

    n = 48
    pid = np.arange(n * n, dtype=np.int64)
    rr, cc = np.divmod(pid, n)
    fid = (rr // 6) * 8 + cc // 6 + 1  # 64 clumps of 6x6
    b1 = fid * 3 + 5                    # clump-constant band 1
    b2 = (pid * 13) % 90 + 5 + fid * fid
    selected = {int(f): (f % 5 == 2) for f in np.unique(fid)}
    nodata = {int(f): (f == 17) for f in np.unique(fid)}
    tbl = pa.table(
        {"pixel_id": pid, "row": rr, "col": cc,
         "fid": fid.astype(np.int64), "b1": b1.astype(np.int64),
         "b2": b2.astype(np.int64)}
    )
    ds = ray.data.from_arrow(tbl).repartition(parts)
    got = merge_selected_clumps(
        ds, ["b1", "b2"], selected, nodata, label_col="fid",
        tile_size=16,
    )
    exp = _brute(
        fid.reshape(n, n), b1.reshape(n, n), b2.reshape(n, n),
        selected, nodata,
    )
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        oid, mean_last = exp[int(row["fid"])]
        assert int(row["out_id"]) == oid
        assert row["surv_mean_last"] == mean_last
    # the fixture really merges something and keeps all classes of rows
    assert (got["out_id"] != got["fid"]).any()
