"""Native (C++) host-side cores.

The reference's host-side mappers are numba-compiled native code
(util/numba.py JIT_OPTIONS); numba is unavailable here, so the serial
per-baseline binning loops are implemented in C++ (mappers.cpp), compiled
on first use with g++ and bound via ctypes. Pure-python fallbacks with
identical semantics live in the averaging package; ``available()`` reports
whether the native path loaded.
"""

from __future__ import annotations

import ctypes
import os
import hashlib
import logging
import subprocess
import tempfile
from pathlib import Path

import numpy as np

__all__ = ["available", "lib", "tc_row_mapper_core", "bda_binner_core",
           "tile_pack_core", "tile_pack_slots"]

log = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "mappers.cpp"

_lib = None
_load_error = None


def _build_and_load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib

    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        build_dir = Path(tempfile.gettempdir()) / "africanus_tpu_native"
        build_dir.mkdir(parents=True, exist_ok=True)
        so_path = build_dir / f"mappers-{tag}.so"

        if not so_path.exists():
            # unique tmp name: concurrent processes (pytest workers,
            # parallel drivers) racing the same fixed .tmp path could
            # replace() a half-written file or FileNotFoundError into
            # the silent numpy fallback
            tmp = so_path.with_suffix(f".so.tmp.{os.getpid()}")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True,
                capture_output=True,
            )
            tmp.replace(so_path)  # atomic: last writer wins, all valid

        lib = ctypes.CDLL(str(so_path))

        lib.tc_row_mapper_core.restype = ctypes.c_int64
        lib.tc_row_mapper_core.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,  # row_lookup
            ctypes.c_void_p,  # time
            ctypes.c_void_p,  # interval
            ctypes.c_void_p,  # flag_row (nullable)
            ctypes.c_double,  # time_bin_secs
            ctypes.c_double,  # sentinel
            ctypes.c_void_p,  # bin_lookup
            ctypes.c_void_p,  # time_lookup
            ctypes.c_void_p,  # interval_lookup
            ctypes.c_void_p,  # bin_flagged
        ]

        lib.bda_binner_core.restype = None
        lib.bda_binner_core.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,  # row_lookup
            ctypes.c_void_p,  # auto_corr
            ctypes.c_void_p,  # time
            ctypes.c_void_p,  # interval
            ctypes.c_void_p,  # uvw
            ctypes.c_void_p,  # flag_row (nullable)
            ctypes.c_void_p,  # chan_width
            ctypes.c_void_p, ctypes.c_int64,  # nchan_factors, nfactors
            ctypes.c_double, ctypes.c_double, ctypes.c_double,  # max_lm, n_max, dphi
            ctypes.c_double, ctypes.c_double,  # time_bin_secs, max_chan_freq
            ctypes.c_double, ctypes.c_int64,  # bandwidth, min_nchan
            ctypes.c_double,  # sentinel
            ctypes.c_void_p,  # bin_lookup
            ctypes.c_void_p,  # time_lookup
            ctypes.c_void_p,  # interval_lookup
            ctypes.c_void_p,  # bin_flagged
            ctypes.c_void_p,  # bin_nchan
            ctypes.c_void_p,  # bin_chan_width
            ctypes.c_void_p,  # out_counts
        ]

        lib.tile_pack_core.restype = None
        lib.tile_pack_core.argtypes = (
            [ctypes.c_int64] * 3 + [ctypes.c_void_p] * 18
        )

        lib.tile_pack_slots_core.restype = None
        lib.tile_pack_slots_core.argtypes = (
            [ctypes.c_int64] * 3 + [ctypes.c_void_p] * 3
        )

        _lib = lib
        log.debug("native mappers loaded from %s", so_path)
    except Exception as e:  # g++ missing, compile failure, …
        log.warning("native mappers unavailable (%s); using numpy "
                    "fallbacks", e)
        _load_error = e
        _lib = None
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def lib():
    l = _build_and_load()
    if l is None:
        raise RuntimeError(f"native mappers unavailable: {_load_error}")
    return l


def _ptr(a):
    return None if a is None else a.ctypes.data_as(ctypes.c_void_p)


def tc_row_mapper_core(row_lookup, time, interval, flag_row, time_bin_secs,
                       sentinel, bin_lookup, time_lookup, interval_lookup,
                       bin_flagged):
    """ctypes shim; arrays must be C-contiguous with the documented dtypes."""
    nbl, ntime = row_lookup.shape
    return lib().tc_row_mapper_core(
        nbl, ntime,
        _ptr(row_lookup), _ptr(time), _ptr(interval), _ptr(flag_row),
        float(time_bin_secs), float(sentinel),
        _ptr(bin_lookup), _ptr(time_lookup), _ptr(interval_lookup),
        _ptr(bin_flagged),
    )


def bda_binner_core(row_lookup, auto_corr, time, interval, uvw, flag_row,
                    chan_width, nchan_factors, max_lm, n_max, dphi,
                    time_bin_secs, max_chan_freq, bandwidth, min_nchan,
                    sentinel, bin_lookup, time_lookup, interval_lookup,
                    bin_flagged, bin_nchan, bin_chan_width):
    nbl, ntime = row_lookup.shape
    nchan = chan_width.shape[0]
    out_counts = np.zeros(2, np.int64)
    lib().bda_binner_core(
        nbl, ntime, nchan,
        _ptr(row_lookup), _ptr(auto_corr), _ptr(time), _ptr(interval),
        _ptr(uvw), _ptr(flag_row), _ptr(chan_width),
        _ptr(nchan_factors), nchan_factors.shape[0],
        float(max_lm), float(n_max), float(dphi),
        float(time_bin_secs), float(max_chan_freq),
        float(bandwidth), int(min_nchan), float(sentinel),
        _ptr(bin_lookup), _ptr(time_lookup), _ptr(interval_lookup),
        _ptr(bin_flagged), _ptr(bin_nchan), _ptr(bin_chan_width),
        _ptr(out_counts),
    )
    return int(out_counts[0]), int(out_counts[1])


def tile_pack_core(tile_ids, group_base, group, ntiles, sample_id, ir, ic,
                   fr, fc, uf, vf, scale, o_sample, o_ir, o_ic, o_fr,
                   o_fc, o_uf, o_vf, o_scale):
    """Stable counting-sort placement of tile-plan entries (see
    mappers.cpp tile_pack_core). Arrays must be C-contiguous; fr/fc and
    uf/vf pairs are nullable as a unit."""
    lib().tile_pack_core(
        tile_ids.shape[0], int(group), int(ntiles),
        _ptr(tile_ids), _ptr(group_base),
        _ptr(sample_id), _ptr(ir), _ptr(ic), _ptr(fr), _ptr(fc),
        _ptr(uf), _ptr(vf), _ptr(scale),
        _ptr(o_sample), _ptr(o_ir), _ptr(o_ic), _ptr(o_fr), _ptr(o_fc),
        _ptr(o_uf), _ptr(o_vf), _ptr(o_scale),
    )


def tile_pack_slots(tile_ids, group_base, group, ntiles):
    """Per-entry flat slot indices into the packed (ngroups, group) layout
    (stable within each tile). tile_ids/group_base must be C-contiguous
    int64; returns (n,) int64."""
    slots = np.empty(tile_ids.shape[0], np.int64)
    lib().tile_pack_slots_core(
        tile_ids.shape[0], int(group), int(ntiles),
        _ptr(tile_ids), _ptr(group_base), _ptr(slots),
    )
    return slots
