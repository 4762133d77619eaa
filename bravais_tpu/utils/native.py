"""ctypes bindings for the native host core (csrc/bravais_host.cpp).

Provides C++ dense Bloch-operator assemblers — the native twins of
``operators/dense.py`` (SURVEY.md §4.2 item 5 oracles; host-side C++
layer mirroring the reference's assembly role). Auto-builds the shared
library with `make` on first use; falls back to None if no toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libbravais_host.so"
_lib = None


def load(build: bool = True):
    """Load (building if needed) the native library, or return None."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build:
        try:
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.bh_assemble_h1.argtypes = [
        ctypes.c_int, i64p, ctypes.c_int, ctypes.c_int, f64p, f64p, f64p,
        f64p, ctypes.c_double, f64p, f64p, f64p, f64p, f64p]
    lib.bh_assemble_h1.restype = ctypes.c_int
    lib.bh_assemble_nedelec.argtypes = [
        i64p, ctypes.c_int, ctypes.c_int, f64p, f64p, f64p, f64p, f64p,
        f64p, f64p, ctypes.c_double, f64p, f64p, f64p, f64p, f64p]
    lib.bh_assemble_nedelec.restype = ctypes.c_int
    lib.bh_h1_dof_map.argtypes = [ctypes.c_int, i64p, ctypes.c_int, i64p]
    lib.bh_h1_dof_map.restype = ctypes.c_int
    _lib = lib
    return _lib


def _coef_elem_major(space, coef) -> np.ndarray:
    """Interleaved (n1,q,...,nd,q) coefficient -> (nelem, q^d) C-order."""
    from bravais_tpu.operators.helmholtz import eval_coefficient
    xq = space.qpoints_phys()
    cq = eval_coefficient(coef, xq)
    d = space.dim
    perm = [2 * i for i in range(d)] + [2 * i + 1 for i in range(d)]
    return np.ascontiguousarray(
        np.transpose(cq, perm).reshape(space.grid.n_elements, -1))


def assemble_h1(space, k, alpha=1.0, beta=1.0
                ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native twin of operators.dense.assemble_h1; None if lib missing."""
    lib = load()
    if lib is None:
        return None
    d = space.dim
    N = space.ndofs
    A = np.zeros((N, N), np.complex128)
    M = np.zeros((N, N), np.complex128)
    shape = np.asarray(space.grid.shape, np.int64)
    rc = lib.bh_assemble_h1(
        d, shape, space.p, space.q,
        np.ascontiguousarray(space.basis.B),
        np.ascontiguousarray(space.basis.D),
        np.ascontiguousarray(space.basis.qwts),
        np.ascontiguousarray(space.grid.Jinv), space.grid.detJ,
        _coef_elem_major(space, alpha), _coef_elem_major(space, beta),
        np.ascontiguousarray(np.asarray(k, np.float64)),
        A.view(np.float64), M.view(np.float64))
    if rc != 0:
        raise RuntimeError(f"bh_assemble_h1 failed rc={rc}")
    return A, M


def assemble_nedelec(space, k, eps=1.0, mu_inv=1.0
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native twin of operators.dense.assemble_nedelec (quasi-periodic)."""
    lib = load()
    if lib is None:
        return None
    N = space.ndofs
    A = np.zeros((N, N), np.complex128)
    M = np.zeros((N, N), np.complex128)
    shape = np.asarray(space.grid.shape, np.int64)
    phases = np.exp(1j * (space.grid.lattice.A
                          @ np.asarray(k, np.float64)))
    detJs = float(np.linalg.det(space.grid.J))
    rc = lib.bh_assemble_nedelec(
        shape, space.p, space.q,
        np.ascontiguousarray(space.closed.B),
        np.ascontiguousarray(space.closed.D),
        np.ascontiguousarray(space.open.B),
        np.ascontiguousarray(space.open.D),
        np.ascontiguousarray(space.closed.qwts),
        np.ascontiguousarray(space.grid.J),
        np.ascontiguousarray(space.grid.Jinv), detJs,
        _coef_elem_major(space, eps), _coef_elem_major(space, mu_inv),
        np.ascontiguousarray(phases.view(np.float64)),
        A.view(np.float64), M.view(np.float64))
    if rc != 0:
        raise RuntimeError(f"bh_assemble_nedelec failed rc={rc}")
    return A, M


def h1_dof_map(space) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    d = space.dim
    nloc = (space.p + 1) ** d
    out = np.zeros(space.grid.n_elements * nloc, np.int64)
    lib.bh_h1_dof_map(d, np.asarray(space.grid.shape, np.int64), space.p,
                      out)
    return out.reshape(space.grid.n_elements, nloc)
