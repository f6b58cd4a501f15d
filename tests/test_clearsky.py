"""Clear-sky composite vs a single-grid numpy transcription of the
reference chain (EDT -> threshold -> CC -> rm-small -> re-threshold
-> intersect-init -> 3x3 opening -> CC -> rm-small)."""

import numpy as np
import pyarrow as pa
import pytest

from rsgislib_ray.stages.calibration import clear_sky_regions


def _cc_labels(mask):
    """4-connected components; label = min pixel_id in component."""
    h, w = mask.shape
    lab = -np.ones((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            if mask[r, c] and lab[r, c] < 0:
                stack = [(r, c)]
                members = []
                lab[r, c] = -2
                while stack:
                    rr, cc = stack.pop()
                    members.append((rr, cc))
                    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        r2, c2 = rr + dr, cc + dc
                        if (
                            0 <= r2 < h
                            and 0 <= c2 < w
                            and mask[r2, c2]
                            and lab[r2, c2] == -1
                        ):
                            lab[r2, c2] = -2
                            stack.append((r2, c2))
                m = min(rr * w + cc for rr, cc in members)
                for rr, cc in members:
                    lab[rr, cc] = m
    return lab


def _rm_small(mask, min_size):
    lab = _cc_labels(mask)
    out = np.zeros_like(mask)
    for v in np.unique(lab[lab >= 0]):
        sel = lab == v
        if sel.sum() >= min_size:
            out |= sel
    return out


def _brute_clear_sky(cloud, valid, init_d, min_size, final_d):
    h, w = cloud.shape
    tr, tc = np.nonzero((cloud == 1) | (cloud == 2))
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    d2 = np.full((h, w), np.int64(1 << 60))
    for r0, c0 in zip(tr, tc):
        d2 = np.minimum(d2, (rr - r0) ** 2 + (cc - c0) ** 2)
    m1 = (valid == 1) & (d2 > init_d * init_d)
    init = _rm_small(m1, min_size)
    m2 = (valid == 1) & (d2 > final_d * final_d)
    lab2 = _cc_labels(m2)
    keep_labels = set(np.unique(lab2[init & (lab2 >= 0)]))
    kept = np.isin(lab2, list(keep_labels)) & m2
    # 3x3 opening: erode (all in-grid window kept) then dilate
    er = np.zeros_like(kept)
    for r in range(h):
        for c in range(w):
            if kept[r, c]:
                ok = True
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        r2, c2 = r + dr, c + dc
                        if 0 <= r2 < h and 0 <= c2 < w and not kept[r2, c2]:
                            ok = False
                er[r, c] = ok
    di = np.zeros_like(er)
    for r in range(h):
        for c in range(w):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    r2, c2 = r + dr, c + dc
                    if 0 <= r2 < h and 0 <= c2 < w and er[r2, c2]:
                        di[r, c] = True
    final = _rm_small(di, min_size)
    return set((np.flatnonzero(final.ravel())).tolist())


def _fixture(n=60):
    pid = np.arange(n * n, dtype=np.int64)
    row, col = np.divmod(pid, n)
    cloud = np.zeros(n * n, dtype=np.int64)
    cloud[((row - 15) ** 2 + (col - 15) ** 2) < 30] = 1
    cloud[((row - 40) ** 2 + (col - 45) ** 2) < 20] = 2
    cloud[(row * 13 + col * 29) % 211 == 0] = 1
    valid = (col >= 2).astype(np.int64)
    return pa.table(
        {
            "pixel_id": pid,
            "row": row,
            "col": col,
            "cloud": cloud,
            "valid": valid,
        }
    ), cloud.reshape(n, n), valid.reshape(n, n)


@pytest.mark.parametrize("parts", [2, 7])
def test_clear_sky_vs_brute(ray_session, parts):
    import ray.data

    t, cloud, valid = _fixture()
    got = set(
        clear_sky_regions(
            ray.data.from_arrow(t).repartition(parts),
            60,
            60,
            init_dist=8,
            init_min_size=40,
            final_dist=3,
            tile_size=16,
        )
        .to_pandas()["pixel_id"]
        .tolist()
    )
    want = _brute_clear_sky(cloud, valid, 8, 40, 3)
    assert got == want
    assert len(want) > 200  # fixture actually produces clear sky
