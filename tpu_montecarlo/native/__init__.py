"""Native (C++) parity oracle, loaded via ctypes.

The shared library is built on demand with g++ (no pybind11 in this
environment; the C ABI + ctypes keeps the binding layer dependency-free).
See mc_oracle.cpp for what it implements and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["get_oracle", "NativeOracle", "oracle_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mc_oracle.cpp")
_LOCK = threading.Lock()
_CACHED: Optional["NativeOracle"] = None
_BUILD_ERROR: Optional[str] = None

_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build_library() -> str:
    """Compile mc_oracle.cpp to a shared object in a cache dir."""
    cache_dir = os.path.join(_HERE, "_build")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libmc_oracle.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    with tempfile.TemporaryDirectory() as td:
        tmp_so = os.path.join(td, "libmc_oracle.so")
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", tmp_so,
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp_so, so_path)
    return so_path


class NativeOracle:
    """Typed ctypes wrapper over the C oracle."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.mc_sample.argtypes = [
            ctypes.c_int32, _F32P, ctypes.c_uint64, ctypes.c_int64,
            _F32P, _F32P, ctypes.c_int64, _F32P,
        ]
        lib.mc_pdf_from_table.argtypes = [
            _F32P, ctypes.c_int64, _F32P, _F32P, ctypes.c_int64, _F32P,
        ]
        lib.mc_log_pdf_from_table.argtypes = [
            _F32P, ctypes.c_int64, _F32P, _F32P, ctypes.c_int64, _F32P,
        ]
        lib.mc_log_pdf.argtypes = [
            ctypes.c_int32, _F32P, _F32P, ctypes.c_int64, _F32P,
        ]
        lib.mc_integrate_moments.argtypes = [
            ctypes.c_int32, _F32P, ctypes.c_uint64, ctypes.c_int64,
            _F32P, _F32P, ctypes.c_int64, ctypes.c_int32, _F64P,
        ]
        lib.mc_mcmc_moments.argtypes = [
            ctypes.c_int32, _F32P, ctypes.c_int32, _F32P,
            ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _F32P, _F32P, ctypes.c_int64,
            _F32P, _F32P, ctypes.c_int64,
            _F32P, _F32P, ctypes.c_int64,
            ctypes.c_int32, _F64P,
        ]
        lib.mc_mcmc_moments.restype = ctypes.c_double
        lib.mc_mean_reduce.argtypes = [
            _F32P, ctypes.c_int64, ctypes.c_int32, _F64P,
        ]
        lib.mc_mcmc_nd_gauss.argtypes = [
            ctypes.c_double, _F32P, ctypes.c_int32, ctypes.c_uint64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _F64P,
        ]
        lib.mc_mcmc_nd_gauss.restype = ctypes.c_double
        lib.mc_integrate_nd_mean.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            _F32P, ctypes.c_int32, ctypes.c_uint64, ctypes.c_int64,
            _F32P, _F32P, ctypes.c_int64, ctypes.c_int32, _F64P,
        ]
        lib.mc_integrate_stderr.argtypes = [
            ctypes.c_int32, _F32P, ctypes.c_uint64, ctypes.c_int64,
            _F32P, _F32P, ctypes.c_int64, ctypes.c_int32, _F64P, _F64P,
        ]
        lib.mc_split_rhat_ess.argtypes = [
            _F64P, _F64P, ctypes.c_int64, ctypes.c_int64, _F64P, _F64P,
        ]

    @staticmethod
    def _tbl(arr) -> np.ndarray:
        if arr is None:
            return np.zeros(1, np.float32)
        return np.ascontiguousarray(arr, np.float32)

    def sample(
        self, kind: int, params, seed: int, n: int,
        x_table=None, cdf_table=None,
    ) -> np.ndarray:
        out = np.empty(n, np.float32)
        xt = self._tbl(x_table)
        ct = self._tbl(cdf_table)
        table_n = len(xt) if x_table is not None else 0
        self._lib.mc_sample(
            kind, np.asarray(params, np.float32), seed, n, xt, ct, table_n, out
        )
        return out

    def pdf_from_table(self, x, x_table, pdf_table) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        out = np.empty(len(x), np.float32)
        self._lib.mc_pdf_from_table(
            x, len(x), self._tbl(x_table), self._tbl(pdf_table),
            len(x_table), out,
        )
        return out

    def log_pdf_from_table(self, x, x_table, log_pdf_table) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        out = np.empty(len(x), np.float32)
        self._lib.mc_log_pdf_from_table(
            x, len(x), self._tbl(x_table), self._tbl(log_pdf_table),
            len(x_table), out,
        )
        return out

    def log_pdf(self, kind: int, params, x) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        out = np.empty(len(x), np.float32)
        self._lib.mc_log_pdf(kind, np.asarray(params, np.float32), x, len(x), out)
        return out

    def integrate_moments(
        self, kind: int, params, seed: int, n: int, k: int,
        x_table=None, cdf_table=None,
    ) -> np.ndarray:
        out = np.empty(k, np.float64)
        xt = self._tbl(x_table)
        ct = self._tbl(cdf_table)
        table_n = len(xt) if x_table is not None else 0
        self._lib.mc_integrate_moments(
            kind, np.asarray(params, np.float32), seed, n, xt, ct,
            table_n, k, out,
        )
        return out

    def mcmc_moments(
        self, prop_kind: int, prop_params, targ_kind: int, targ_params,
        seed: int, n_chains: int, n_steps: int, n_burnin: int, k: int,
        prop_x_table=None, prop_cdf_table=None,
        targ_lx=None, targ_lp=None,
        prop_lx=None, prop_lp=None,
    ) -> Tuple[np.ndarray, float]:
        out = np.empty(k, np.float64)
        pxt = self._tbl(prop_x_table)
        pct = self._tbl(prop_cdf_table)
        tlx = self._tbl(targ_lx)
        tlp = self._tbl(targ_lp)
        plx = self._tbl(prop_lx)
        plp = self._tbl(prop_lp)
        acc = self._lib.mc_mcmc_moments(
            prop_kind, np.asarray(prop_params, np.float32),
            targ_kind, np.asarray(targ_params, np.float32),
            seed, n_chains, n_steps, n_burnin,
            pxt, pct, len(pxt) if prop_x_table is not None else 0,
            tlx, tlp, len(tlx) if targ_lx is not None else 0,
            plx, plp, len(plx) if prop_lx is not None else 0,
            k, out,
        )
        return out, float(acc)

    def integrate_stderr(
        self, kind: int, params, seed: int, n: int, k: int,
        x_table=None, cdf_table=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Welford-in-double (means, stderrs) of the k monomial moments —
        the independent reference for the kernels' f32 pilot-shifted
        error bars."""
        means = np.empty(k, np.float64)
        ses = np.empty(k, np.float64)
        xt = self._tbl(x_table)
        ct = self._tbl(cdf_table)
        table_n = len(xt) if x_table is not None else 0
        self._lib.mc_integrate_stderr(
            kind, np.asarray(params, np.float32), seed, n, xt, ct,
            table_n, k, means, ses,
        )
        return means, ses

    def split_rhat_ess(
        self, seq_means, within_vars, n1: int
    ) -> Tuple[float, float]:
        """Double-precision split-R-hat + ESS from reduced split-half
        stats — the independent reference for mcmc_xla.split_rhat_ess."""
        sm = np.ascontiguousarray(seq_means, np.float64)
        wv = np.ascontiguousarray(within_vars, np.float64)
        r = np.empty(1, np.float64)
        e = np.empty(1, np.float64)
        self._lib.mc_split_rhat_ess(sm, wv, len(sm), n1, r, e)
        return float(r[0]), float(e[0])

    def mcmc_nd_gauss(
        self, rho: float, prop_params, d: int, seed: int,
        n_chains: int, n_steps: int, n_burnin: int,
    ) -> Tuple[np.ndarray, float]:
        """d-dimensional joint-Gaussian MH oracle: (array([E[x0*x1],
        E[x0^2]]), acceptance) — the independent reference for the nd MH
        kernels' summed-proposal acceptance math."""
        out = np.empty(2, np.float64)
        acc = self._lib.mc_mcmc_nd_gauss(
            float(rho),
            np.ascontiguousarray(prop_params, np.float32).reshape(-1),
            d, seed, n_chains, n_steps, n_burnin, out,
        )
        return out, float(acc)

    def integrate_nd_mean(
        self, kinds, params, seed: int, n: int,
        x_table=None, cdf_table=None, table_dim: int = -1,
    ) -> np.ndarray:
        """(E[prod_j x_j], E[sum_j x_j^2]) over d independent dims (one
        optional custom-table dim) — the independent reference for the nd
        fused integrate kernel's per-dim streams."""
        kinds = np.ascontiguousarray(kinds, np.int32)
        out = np.empty(2, np.float64)
        xt = self._tbl(x_table)
        ct = self._tbl(cdf_table)
        self._lib.mc_integrate_nd_mean(
            kinds,
            np.ascontiguousarray(params, np.float32).reshape(-1),
            len(kinds), seed, n, xt, ct,
            len(xt) if x_table is not None else 0,
            int(table_dim), out,
        )
        return out

    def mean_reduce(self, partials: np.ndarray) -> np.ndarray:
        partials = np.ascontiguousarray(partials, np.float32)
        threads, k = partials.shape
        out = np.empty(k, np.float64)
        self._lib.mc_mean_reduce(partials.reshape(-1), threads, k, out)
        return out


def get_oracle() -> NativeOracle:
    """Build (once) and return the native oracle."""
    global _CACHED, _BUILD_ERROR
    with _LOCK:
        if _CACHED is not None:
            return _CACHED
        if _BUILD_ERROR is not None:
            raise RuntimeError(f"native oracle unavailable: {_BUILD_ERROR}")
        try:
            so_path = _build_library()
            _CACHED = NativeOracle(ctypes.CDLL(so_path))
        except Exception as e:  # noqa: BLE001 — record any toolchain failure
            _BUILD_ERROR = str(e)
            raise RuntimeError(f"native oracle unavailable: {e}") from e
        return _CACHED


def oracle_available() -> bool:
    try:
        get_oracle()
        return True
    except RuntimeError:
        return False
