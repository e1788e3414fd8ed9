"""Minimal nibabel shim backed by this framework's own NIfTI codec.

nibabel is not installed in this environment; the reference implementation
imports it for all IO. Installing this shim into sys.modules lets the
reference run unmodified, enabling true behavioral parity tests (train the
reference and our framework on identical data and compare).
"""

import sys
import types

import numpy as np

from multimodal_organ_segmentation_tpu.utils import nifti as _nifti


class Nifti1Image:
    def __init__(self, dataobj, affine, header=None):
        self._img = _nifti.NiftiImage(np.asarray(dataobj), affine, header)

    @property
    def affine(self):
        return self._img.affine

    @property
    def header(self):
        return self._img.header

    @property
    def dataobj(self):
        return self._img.dataobj

    def get_fdata(self, dtype=np.float64):
        return self._img.get_fdata(dtype)


def load(path):
    img = _nifti.load(path)
    out = Nifti1Image.__new__(Nifti1Image)
    out._img = img
    return out


def save(img, path):
    _nifti.save(img._img if isinstance(img, Nifti1Image) else img, path)


Nifti1Header = _nifti.NiftiHeader


def install():
    """Install the shim as ``nibabel`` if the real one is absent."""
    if "nibabel" in sys.modules:
        return sys.modules["nibabel"]
    mod = types.ModuleType("nibabel")
    mod.load = load
    mod.save = save
    mod.Nifti1Image = Nifti1Image
    mod.Nifti1Header = Nifti1Header
    sys.modules["nibabel"] = mod
    return mod
