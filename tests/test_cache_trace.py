"""The committed compile cache must stay warm for the driver.

``BENCH_r01/r02`` both failed because the driver's bench run paid a cold
160^3 compile inside its watchdog budget (DESIGN.md section 7). The fix
relies on the committed ``.jax_cache/`` — whose keys derive from the traced
program. This test pins the StableHLO hashes of the two driver-facing
programs (abstract lowering only — a few seconds, so it runs in the fast
set); if it fails, a commit changed the flagship trace and the cache is
cold again for the driver. Fix: re-warm on the real chip (``make bench``,
commit the new cache entries, update ``TRACE_HASHES`` in
``tools/check_cache_trace.py``) or revert the trace change.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_driver_facing_traces_unchanged():
    import check_cache_trace as cct

    current = {"bench": cct.bench_trace_hash(),
               "entry": cct.entry_trace_hash()}
    drifted = {k: v for k, v in current.items()
               if v != cct.TRACE_HASHES[k]}
    assert not drifted, (
        f"driver-facing trace(s) drifted since the cache warm: {drifted}. "
        f"The committed .jax_cache is now COLD for the driver's bench/"
        f"compile-check. Re-warm on the real chip (make bench), commit the "
        f"new cache entries and update TRACE_HASHES, or revert the trace "
        f"change. See DESIGN.md section 7 item 5.")
