"""Image-chip augmentation kernels.

Mirrors reference python/rsgislib/classification/__init__.py:899
``flip_ref_chip_hdf5_file`` — the chip doubler used to augment
extracted (chip, ref) training pairs. The reference streams HDF5;
here the same per-chip kernel runs inside map_batches over chip
tables (the engine's sample representation, as for the other
HDF5-sample operators).

Parity contract (pinned by the ``chip_flip_augment`` query):

- REF chips (2-D, uint16) and DATA chips (y, x, band float32) both
  produce TWO outputs per input, INTERLEAVED (x-flip then y-flip per
  chip, not two blocks): out_feat = 2n, then 2n+1.
- The reference writes the flips through transposed-flip idioms:
  ``flip(REF.T, axis=0).T`` == a LEFT-RIGHT flip (x axis) and
  ``flip(REF.T, axis=1).T`` == an UP-DOWN flip; for DATA the
  (y,x,b) -> (b,x,y) transpose makes ``axis=1`` the x axis and
  ``axis=2`` the y axis — so both streams flip x first, y second.
- Outputs are cast to float32 (DATA) / uint16 (REF) regardless of
  input dtype (numpy.copyto casting="safe" into pre-typed arrays).
"""

from __future__ import annotations

import numpy as np


def flip_ref_chip_pair(
    data_chip: np.ndarray, ref_chip: np.ndarray
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """One input (DATA, REF) chip -> the two flipped outputs, in the
    reference's interleaved order (x-flip first, y-flip second),
    via the LITERAL transposed-flip expressions."""
    chip_size = ref_chip.shape[0]
    n_bands = data_chip.shape[2]
    out_data = []
    out_ref = []
    ref0 = np.zeros([chip_size, chip_size], dtype=np.uint16)
    dat0 = np.zeros([chip_size, chip_size, n_bands], dtype=np.float32)
    np.copyto(ref0, np.flip(ref_chip.T, axis=0).T, casting="safe")
    np.copyto(dat0, np.flip(data_chip.T, axis=1).T, casting="safe")
    out_ref.append(ref0)
    out_data.append(dat0)
    ref1 = np.zeros([chip_size, chip_size], dtype=np.uint16)
    dat1 = np.zeros([chip_size, chip_size, n_bands], dtype=np.float32)
    np.copyto(ref1, np.flip(ref_chip.T, axis=1).T, casting="safe")
    np.copyto(dat1, np.flip(data_chip.T, axis=2).T, casting="safe")
    out_ref.append(ref1)
    out_data.append(dat1)
    return out_data, out_ref
