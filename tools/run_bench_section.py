"""Run ONE bench.py section standalone and print its result dict as JSON.

Usage:  python tools/run_bench_section.py <section> [...]
        python tools/run_bench_section.py --list

Sections come from bench.SECTIONS — the same registry main()'s budget loop
uses, so the two can never diverge. Useful when a single new section needs
a real measured number without paying for a full ~18 min bench pass — e.g.
to refresh one key of BENCH_local.json after adding a section. Same caveats
as bench.py: run SOLO (1-core host, see CLAUDE.md), numbers are only valid
with nothing else running.

All requested names are validated BEFORE any device work, and each section
runs under its own try/except — a typo in the last argv or a section crash
can no longer throw away minutes of already-measured TPU results (the
partial dict is printed either way; failures land in "errors" and the exit
code is non-zero).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import bench

    table = {name: fn for name, fn, _ in bench.SECTIONS}
    if not argv or argv[0] == "--list":
        print("\n".join(table))
        return 0

    unknown = [n for n in argv if n not in table]
    if unknown:
        print(f"unknown section(s) {unknown}; --list shows options", file=sys.stderr)
        return 2

    out: dict = {}
    seconds: dict = {}
    errors: dict = {}
    for name in argv:
        t0 = time.perf_counter()
        try:
            out.update(table[name]())
        except Exception as e:
            traceback.print_exc()
            errors[name] = f"{type(e).__name__}: {e}"
        seconds[name] = round(time.perf_counter() - t0, 1)
    if errors:
        out["errors"] = errors
    out["section_seconds"] = seconds
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
