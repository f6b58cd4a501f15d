"""JSON dict-structure path helpers.

Mirrors reference python/rsgislib/tools/utils.py:911-1205 — the
``dict_struct_*`` family used to pull typed values out of parsed JSON
config/metadata files. Transcribed from scratch with the reference's
quirks kept (pinned by the ``dict_struct_panel`` query + pytest):

- every getter re-walks the path and raises on the FIRST missing
  step (the error message carries the ':'-joined prefix);
  ``does_path_exist`` is the only non-raising walker.
- ``get_numeric_value`` type-dispatches on ``type(x).__name__``
  substring checks: 'int' in name -> int(x), 'float' in name ->
  float(x), and a NUMERIC STRING (is_number True, name 'str')
  falls through to the else branch -> float(x). Bounds raise
  strictly outside [valid_lower, valid_upper], lower checked first.
- ``get_boolean_value`` accepts only genuine bools (an int 1 raises).
- ``get_date_value``/``get_datetime_value`` accept a single format
  or a LIST of formats tried in order (first success wins; the last
  exception is re-raised if none match); the datetime variant strips
  a trailing 'Z' BEFORE parsing; the date variant returns .date().
- ``get_str_list_value`` validates every element is a str and,
  when ``valid_values`` is given, that each element is in it;
  ``get_str_value`` validates membership only.
"""

from __future__ import annotations

import datetime
from typing import Dict, List


class DictStructError(Exception):
    """Raised where the reference raises RSGISPyException."""


def _walk(dict_struct_obj: Dict, tree_sequence: List):
    curr = dict_struct_obj
    steps_str = ""
    for tree_step in tree_sequence:
        steps_str = steps_str + ":" + tree_step
        if tree_step in curr:
            curr = curr[tree_step]
        else:
            raise DictStructError("Could not find '{}'".format(steps_str))
    return curr


def _is_number(str_val) -> bool:
    """tools/utils.py:59 is_number — float() accept test (the same
    complex-accept quirk the oracled utils_num_panel pins)."""
    try:
        float(str_val)
    except ValueError:
        try:
            complex(str_val)
        except ValueError:
            return False
    return True


def dict_struct_does_path_exist(
    dict_struct_obj: Dict, tree_sequence: List
) -> bool:
    """tools/utils.py:911 — non-raising walker."""
    curr = dict_struct_obj
    path_exists = True
    for tree_step in tree_sequence:
        if tree_step in curr:
            curr = curr[tree_step]
        else:
            path_exists = False
            break
    return path_exists


def dict_struct_get_str_value(
    dict_struct_obj: Dict, tree_sequence: List, valid_values: List = None
) -> str:
    """tools/utils.py:933."""
    curr = _walk(dict_struct_obj, tree_sequence)
    if valid_values is not None:
        if curr not in valid_values:
            raise DictStructError(
                "'{}' is not within the list of valid values.".format(curr)
            )
    return curr


def dict_struct_get_boolean_value(
    dict_struct_obj: Dict, tree_sequence: List
) -> bool:
    """tools/utils.py:965 — strict bool type check by __name__."""
    curr = _walk(dict_struct_obj, tree_sequence)
    if type(curr).__name__ == "bool":
        return curr
    raise DictStructError("'{}' is not 'True' or 'False'.".format(curr))


def _strptime_multi(value: str, formats, to_date: bool):
    if isinstance(formats, str):
        try:
            out = datetime.datetime.strptime(value, formats)
        except Exception as e:
            raise DictStructError(e)
        return out.date() if to_date else out
    elif isinstance(formats, list):
        found = False
        except_obj = None
        out = None
        for fmt in formats:
            try:
                out = datetime.datetime.strptime(value, fmt)
                found = True
                break
            except Exception as e:
                except_obj = e
        if not found:
            raise DictStructError(except_obj)
        return out.date() if to_date else out
    raise DictStructError(
        "Do not know what the type is of date_format variable."
    )


def dict_struct_get_date_value(
    dict_struct_obj: Dict,
    tree_sequence: List,
    date_format: str = "%Y-%m-%d",
):
    """tools/utils.py:992 — returns a date; format-list fallback."""
    curr = _walk(dict_struct_obj, tree_sequence)
    return _strptime_multi(curr, date_format, to_date=True)


def dict_struct_get_datetime_value(
    dict_struct_obj: Dict,
    tree_sequence: List,
    date_time_format: str = "%Y-%m-%dT%H:%M:%S.%f",
):
    """tools/utils.py:1043 — strips a trailing 'Z' BEFORE parsing."""
    curr = _walk(dict_struct_obj, tree_sequence)
    curr = curr.replace("Z", "")
    return _strptime_multi(curr, date_time_format, to_date=False)


def dict_struct_get_str_list_value(
    dict_struct_obj: Dict, tree_sequence: List, valid_values: List = None
) -> List[str]:
    """tools/utils.py:1095 — list type + per-element str/membership."""
    curr = _walk(dict_struct_obj, tree_sequence)
    if type(curr).__name__ != "list":
        raise DictStructError("Retrieved value is not a list.")
    if valid_values is not None:
        for val in curr:
            if type(val).__name__ != "str":
                raise DictStructError(
                    "'{}' is not of type string.".format(val)
                )
            if val not in valid_values:
                raise DictStructError(
                    "'{}' is not within the list of valid values.".format(
                        val
                    )
                )
    return curr


def dict_struct_get_numeric_value(
    dict_struct_obj: Dict,
    tree_sequence: List,
    valid_lower: float = None,
    valid_upper: float = None,
):
    """tools/utils.py:1133 — __name__ substring dispatch + bounds."""
    curr = _walk(dict_struct_obj, tree_sequence)
    out_value = 0.0
    if _is_number(curr):
        if "int" in type(curr).__name__:
            out_value = int(curr)
        elif "float" in type(curr).__name__:
            out_value = float(curr)
        else:
            out_value = float(curr)
    else:
        raise DictStructError("The identified value is not numeric")
    if valid_lower is not None:
        if out_value < valid_lower:
            raise DictStructError(
                "'{}' is less than the defined valid range.".format(
                    out_value
                )
            )
    if valid_upper is not None:
        if out_value > valid_upper:
            raise DictStructError(
                "'{}' is higher than the defined valid range.".format(
                    out_value
                )
            )
    return out_value


def dict_struct_get_list_value(
    dict_struct_obj: Dict, tree_sequence: List
) -> List:
    """tools/utils.py:1184 — list type check only."""
    curr = _walk(dict_struct_obj, tree_sequence)
    if type(curr).__name__ != "list":
        raise DictStructError("Retrieved value is not a list.")
    return curr
