"""Compile-probe backstop for the CT tile pickers.

The scoped-VMEM byte models (`ct_train._estimate_vmem_kind`,
`ct_conv.estimate_vmem*`) order the tile ladders and encode measured
perf preferences, but two rounds of on-chip OOMs (round 2: 16.08 /
17.67 MiB real vs 14.7 / 13.2 estimated; round 3: BENCH_r03 rc=1 at
16.10 vs the 16.00 MiB limit) proved a byte model can never be
*authoritative*: Mosaic's vector-temporary stack depends on the compiled
schedule, not just the declared buffers.

On TPU, every estimator-accepted ladder rung is therefore verified by
AOT-compiling a kernel with the candidate tile before it is chosen
(``jax.jit(fn).lower(*ShapeDtypeStructs).compile()`` — no data, no
execution).  Mosaic's scoped-VMEM rejection ("Ran out of memory in
memory space vmem" / "exceeded scoped vmem limit") drops the picker to
the next rung instead of shipping a kernel that cannot compile.  Probe
results are cached in-process and persisted to ``MIMO_TILE_CACHE``
(default ``/tmp/mimo_tile_probe.json``), so each (kernel, tile, shape)
costs one small compile per machine, ever; the JAX persistent
compilation cache additionally dedupes the XLA work across processes.

Probes run with batch-minimal shapes (2 images, 2 groups): every CT
kernel's VMEM footprint is per-tile (blocks and scratch depend on
``th``/``w``/channel counts only — the batch changes the grid length,
not the allocation), so a 2-image probe is exactly as tight as the
production call.

Set ``MIMO_TILE_PROBE=0`` to disable probing (estimator-only picks,
the pre-round-4 behavior).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Callable, Tuple

import jax

_CACHE: dict = {}
_LOCK = threading.Lock()
_DISK_LOADED = False

_VMEM_MARKERS = (
    "memory space vmem",
    "scoped vmem limit",
    "scoped allocation",
    "vmem limit exceeded",
)


def _cache_path() -> str:
    return os.environ.get("MIMO_TILE_CACHE", "/tmp/mimo_tile_probe.json")


def probing_enabled() -> bool:
    """Probe only where scoped VMEM exists: the real TPU backend."""
    if os.environ.get("MIMO_TILE_PROBE", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _device_tag() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _load_disk() -> None:
    global _DISK_LOADED
    if _DISK_LOADED:
        return
    _DISK_LOADED = True
    try:
        with open(_cache_path()) as f:
            data = json.load(f)
        if isinstance(data, dict):
            _CACHE.update({k: bool(v) for k, v in data.items()})
    except (OSError, ValueError):
        pass


def _save_disk() -> None:
    path = _cache_path()
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        # merge with any concurrent writer's entries before replacing
        merged = {}
        try:
            with open(path) as f:
                on_disk = json.load(f)
            if isinstance(on_disk, dict):
                merged.update(on_disk)
        except (OSError, ValueError):
            pass
        merged.update(_CACHE)
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=0, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        try:
            os.remove(tmp)
        except OSError:
            pass


def is_vmem_oom(exc: BaseException) -> bool:
    msg = str(exc).lower()
    return any(marker in msg for marker in _VMEM_MARKERS)


def probe_fits(key: str, build: Callable[[], Tuple[Callable, tuple]]
               ) -> bool:
    """True iff the kernel described by ``build`` compiles on this chip.

    ``build()`` returns ``(fn, args)`` with ``args`` a tuple of
    ``jax.ShapeDtypeStruct`` — the probe AOT-compiles ``fn`` and
    classifies Mosaic's scoped-VMEM rejection as "does not fit".  Any
    other compile error propagates (a probe must never hide a real
    kernel bug).  Results are memoized under ``key`` (which should
    encode every VMEM-relevant parameter) plus the device kind.
    """
    full_key = f"{_device_tag()}|{key}"
    with _LOCK:
        _load_disk()
        if full_key in _CACHE:
            return _CACHE[full_key]
    fn, args = build()
    try:
        jax.jit(fn).lower(*args).compile()
        ok = True
    except Exception as exc:  # noqa: BLE001 — classified below
        if not is_vmem_oom(exc):
            raise
        ok = False
    with _LOCK:
        _CACHE[full_key] = ok
        _save_disk()
    return ok
