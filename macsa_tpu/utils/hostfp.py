"""Host fingerprint: a short stable ID of this machine's codegen identity.

Why this exists: the JAX persistent compilation cache key does NOT include
the host's CPU feature set, and on this deployment the cache directory
(`~/.cache/jax_comp`) outlives any single machine — it is part of a shared
volume.  A host with a different CPU can therefore load AOT executables
compiled elsewhere: at best subtly different numerics, at worst SIGILL.
The per-host subdirectory removes that class of hazard.

(Precision note, r5: the `cpu_aot_loader` warnings about
``+prefer-no-scatter / +prefer-no-gather`` fire even for entries compiled
on the SAME host — those are LLVM tuning pseudo-features that never appear
in the loader's CPUID-derived host-feature list, so the warning alone does
not prove a foreign entry.  The r4 loss-golden drift those warnings were
blamed for was actually the e2e tests escaping to the real TPU through
`jax.devices()` — see parallel/mesh.py: make_mesh.  The shared-volume
cross-machine load remains real, hence this fingerprint.)

Two consumers:

* ``enable_compilation_cache`` (train/common.py) and bench/tools put the
  persistent cache under ``<base>/<host_fingerprint()>`` so a host only
  ever loads AOT results compiled for its own CPU.
* the e2e loss goldens (tests/test_e2e_driver.py) are keyed by fingerprint:
  committed values assert at tight tolerance only on the host family that
  recorded them; other hosts self-record a local golden on first run and
  assert run-to-run determinism plus a sanity band thereafter.

The fingerprint hashes the CPU feature flags (the exact input to LLVM's
host-feature codegen decisions) plus the machine architecture.  Frequency,
core count, and cache sizes are deliberately excluded — they don't change
codegen.
"""

from __future__ import annotations

import hashlib
import platform


def _cpu_flags() -> str:
    """The first `flags`/`Features` line of /proc/cpuinfo (x86/arm), or ''
    where unreadable (macOS, restricted containers)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip().lower()
                if key in ("flags", "features"):
                    # sort: flag *ordering* is kernel-version noise
                    return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return ""


def host_fingerprint() -> str:
    """12-hex-char digest of (machine arch, sorted CPU feature flags)."""
    ident = f"{platform.machine()}|{_cpu_flags()}"
    return hashlib.sha256(ident.encode()).hexdigest()[:12]
