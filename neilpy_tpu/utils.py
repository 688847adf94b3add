"""Small cross-cutting utilities (parity: voxelize neilpy.py:195-275,
set_print_options neilpy.py:2397-2400)."""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["voxelize", "set_print_options"]


def voxelize(filename, x, y, z, resolution, bottom_fill=True, threshold=1,
             material=0, ve=1, pad=0):
    """Point cloud -> 3-D boolean voxel grid (parity:
    neilpy.py:195-275).

    STL export requires the optional ``voxelfuse`` package (dead in the
    reference too — its import is commented out at neilpy.py:72-74);
    pass ``filename=None`` to skip.
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    z = np.asarray(z, dtype=float)
    x = x - x.min()
    y = y - y.min()
    z = z - z.min()
    max_x, max_y, max_z = x.max(), y.max(), z.max()

    interval = np.ceil(max(max_x, max_y)) / resolution
    xbins = np.arange(0, np.ceil(max_x) + interval, interval)
    ybins = np.arange(0, np.ceil(max_y) + interval, interval)
    zbins = np.arange(0, np.ceil(max_z) + interval / ve, interval / ve)

    H, _ = np.histogramdd((x, y, z), bins=(xbins, ybins, zbins))
    H = H >= threshold

    if bottom_fill:
        # fill every column downward from its lowest occupied voxel
        any_occ = H.any(axis=2)
        lowest = np.where(any_occ, H.argmax(axis=2), -1)
        levels = np.arange(H.shape[2])[None, None, :]
        H = H | ((lowest[:, :, None] >= 0) & (levels < lowest[:, :, None]))

    if pad > 0:
        r, c, _ = H.shape
        H = np.dstack((np.ones((r, c, pad), dtype=bool), H))

    if filename is not None:
        try:
            from voxelfuse.voxel_model import VoxelModel
            from voxelfuse.mesh import Mesh
            from voxelfuse.primitives import generateMaterials
        except ImportError as e:
            raise ImportError(
                "STL export requires the optional 'voxelfuse' package; "
                "pass filename=None to get the voxel array only.") from e
        model = VoxelModel(H, generateMaterials(material))
        Mesh.fromVoxelModel(model).export(filename)
    return H


def set_print_options(places=2, width=0):
    """numpy/pandas float print formatting (parity:
    neilpy.py:2397-2400)."""
    fmt = "{0:" + str(width) + "." + str(places) + "f}"
    np.set_printoptions(formatter={"float": lambda v: fmt.format(v)})
    pd.options.display.float_format = fmt.format
