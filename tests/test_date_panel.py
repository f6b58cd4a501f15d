"""utils_date_panel closed forms vs literal transcriptions of the
tools/utils.py reference loops (create_year_month_start_end_lst:789,
create_year_month_n_months_lst:820 incl. the first=True rollover
quirk, get_datetime_increment_lst:887 post-increment appends,
create_var_list:462 recursive product order)."""

import datetime

import numpy as np


def _ref_start_end(sy, sm, ey, em):
    out = []
    for year in np.arange(sy, ey + 1, 1):
        if (year == sy) and (year == ey):
            months = np.arange(sm, em + 1, 1)
        elif year == sy:
            months = np.arange(sm, 13, 1)
        elif year == ey:
            months = np.arange(1, em + 1, 1)
        else:
            months = np.arange(1, 13, 1)
        for month in months:
            out.append((int(year), int(month)))
    return out


def _ref_n_months(sy, sm, n):
    out = [(sy, sm)]
    months = np.arange(0, n, 1) + sm
    month_vals = months % 12
    year = sy
    first = True
    for month in month_vals:
        if first:
            out.append((year, int(month) + 1))
            first = False
        else:
            if month == 0:
                year += 1
            out.append((year, int(month) + 1))
    return out


def _ref_dt_incr(start, end, interval):
    out = []
    c = start
    while c < end:
        c = c + interval
        out.append(c)
    return out


def _ref_var_list(in_vals_lsts, val_dict=None):
    out_vars = []
    if (in_vals_lsts is None) and (val_dict is not None):
        out_vars.append(dict(val_dict))
    elif in_vals_lsts is not None:
        if len(in_vals_lsts.keys()) > 0:
            key = list(in_vals_lsts.keys())[0]
            vals_arr = in_vals_lsts[key]
            nxt = {k: v for k, v in in_vals_lsts.items() if k != key}
            if len(nxt) == 0:
                nxt = None
            if val_dict is None:
                val_dict = dict()
            for val in vals_arr:
                c = dict(val_dict)
                c[key] = val
                out_vars += _ref_var_list(nxt, c)
    return out_vars


def test_start_end_closed_form():
    for fid in range(1, 400):
        sy = 2000 + (fid * 7) % 20
        sm = (fid * 5) % 12 + 1
        ey = sy + (fid * 3) % 3
        em = (fid * 11) % 12 + 1
        t0, t1 = sy * 12 + sm - 1, ey * 12 + em - 1
        closed = [(t // 12, t % 12 + 1) for t in range(t0, t1 + 1)]
        assert closed == _ref_start_end(sy, sm, ey, em), fid


def test_n_months_closed_form_incl_rollover_quirk():
    for fid in range(1, 400):
        sy = 2000 + (fid * 7) % 20
        sm = (fid * 5) % 12 + 1
        n = (fid * 3) % 25
        closed = [(sy, sm)] + [
            (sy + (sm + i) // 12 - (1 if sm == 12 else 0),
             (sm + i) % 12 + 1)
            for i in range(n)
        ]
        assert closed == _ref_n_months(sy, sm, n), fid
    # the quirk: start month 12 -> second entry keeps the START year
    assert _ref_n_months(2020, 12, 2)[:2] == [(2020, 12), (2020, 1)]


def test_dt_increment_closed_form():
    epoch = datetime.datetime(2000, 1, 1)
    for fid in range(1, 400):
        d0 = (fid * 13) % 1000
        iv = (fid % 13) + 1
        span = (fid * 9) % 50
        start = epoch + datetime.timedelta(days=d0)
        end = start + datetime.timedelta(days=span)
        ref = _ref_dt_incr(start, end, datetime.timedelta(days=iv))
        k = (span + iv - 1) // iv if span > 0 else 0
        closed = [start + datetime.timedelta(days=(j + 1) * iv)
                  for j in range(k)]
        assert closed == ref, fid


def test_var_list_c_order():
    for fid in range(1, 200):
        la, lb, lc = (fid % 3) + 1, (fid % 2) + 1, (fid % 4) + 1
        lsts = {
            "a": [fid + i for i in range(la)],
            "b": [2 * fid + j for j in range(lb)],
            "c": [3 * fid + k for k in range(lc)],
        }
        ref = _ref_var_list(lsts)
        closed = [
            {"a": fid + i // (lb * lc),
             "b": 2 * fid + (i // lc) % lb,
             "c": 3 * fid + i % lc}
            for i in range(la * lb * lc)
        ]
        assert closed == ref, fid
