"""Endmember mtxt text format: read / write / compare.

Mirrors reference python/rsgislib/imagecalc/specunmixing/__init__.py:
``read_endmembers_mtxt`` (:80), ``write_endmembers_mtxt`` (:123) and
``are_endmembers_equal`` (:219), written from scratch over strings so
the same cores serve both file paths and in-table columns.

Parity contract (pinned by the ``endmembers_mtxt`` query + oracle):

- The data line is COLUMN-MAJOR: both read and write iterate bands
  (n) outer, endmembers (m) inner, so flat index ``i = n_idx * m +
  m_idx`` — NOT the row-major order a naive transcription would use.
- Values are formatted with Python ``str(float(v))`` and joined with
  bare commas; the file is ``str(item) + "\\n"`` per line
  (tools/utils.py:329 write_list_to_file), i.e. a trailing newline.
- ``gain`` divides only when STRICTLY > 1 (gain=1 and gain<1 are
  both ignored), and division happens BEFORE the optional weight
  column (Scarth et al 2010) is appended, so the weight is never
  gain-scaled.
- ``are_endmembers_equal`` compares post-round-trip values with
  ``abs(ref - cmp) > flt_dif`` (strict: a difference of exactly
  flt_dif still counts as equal).
"""

from __future__ import annotations

import numpy as np


def write_endmembers_mtxt_str(endmembers_np_arr: np.ndarray) -> str:
    """Matrix -> mtxt file content (write_endmembers_mtxt:123)."""
    out_m, out_n = endmembers_np_arr.shape
    out_line_list = [f"m={out_m}", f"n={out_n}"]
    out_data = ""
    i = 0
    for n_idx in range(out_n):
        for m_idx in range(out_m):
            flt_val = float(endmembers_np_arr[m_idx, n_idx])
            if i == 0:
                out_data = f"{flt_val}"
            else:
                out_data = f"{out_data},{flt_val}"
            i += 1
    out_line_list.append(out_data)
    return "".join(str(item) + "\n" for item in out_line_list)


def read_endmembers_mtxt_str(content: str, gain: float = 1, weight=None):
    """mtxt file content -> (m, n, matrix) (read_endmembers_mtxt:80)."""
    data_lst = [ln.strip() for ln in content.splitlines() if ln.strip() != ""]
    m = int(data_lst[0].split("=")[-1])
    n = int(data_lst[1].split("=")[-1])
    end_mem_arr = np.zeros((m, n))
    data_vals_lst = data_lst[2].split(",")
    i = 0
    for n_idx in range(n):
        for m_idx in range(m):
            end_mem_arr[m_idx, n_idx] = float(data_vals_lst[i])
            i += 1
    if gain > 1:
        end_mem_arr = end_mem_arr / gain
    if weight is not None:
        weights = np.empty([m, 1])
        weights[...] = weight
        end_mem_arr = np.hstack([end_mem_arr, weights])
        n += 1
    return m, n, end_mem_arr


def are_endmembers_equal_str(
    ref_content: str, cmp_content: str, flt_dif: float = 0.0001
) -> bool:
    """Compare two mtxt contents (are_endmembers_equal:219)."""
    n_ref_m, n_ref_b, ref_arr = read_endmembers_mtxt_str(ref_content)
    n_cmp_m, n_cmp_b, cmp_arr = read_endmembers_mtxt_str(cmp_content)
    if n_ref_m != n_cmp_m:
        return False
    if n_ref_b != n_cmp_b:
        return False
    endmembers_eq = True
    for i in range(n_ref_m):
        for j in range(n_ref_b):
            if abs(ref_arr[i][j] - cmp_arr[i][j]) > flt_dif:
                endmembers_eq = False
                break
        if not endmembers_eq:
            break
    return endmembers_eq


def read_endmembers_mtxt(endmembers_file: str, gain: float = 1, weight=None):
    """File-path wrapper matching the reference signature."""
    with open(endmembers_file, "r") as f:
        return read_endmembers_mtxt_str(f.read(), gain=gain, weight=weight)


def write_endmembers_mtxt(
    endmembers_np_arr: np.ndarray, endmembers_file: str
) -> None:
    """File-path wrapper matching the reference signature."""
    with open(endmembers_file, "w") as f:
        f.write(write_endmembers_mtxt_str(endmembers_np_arr))


def are_endmembers_equal(
    ref_endmember_file: str, cmp_endmember_file: str, flt_dif: float = 0.0001
) -> bool:
    """File-path wrapper matching the reference signature."""
    with open(ref_endmember_file, "r") as rf:
        ref_content = rf.read()
    with open(cmp_endmember_file, "r") as cf:
        cmp_content = cf.read()
    return are_endmembers_equal_str(ref_content, cmp_content, flt_dif)
