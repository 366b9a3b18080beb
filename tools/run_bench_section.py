"""Run ONE bench.py section standalone and print its result dict as JSON.

Usage:  python tools/run_bench_section.py <section> [...]
        python tools/run_bench_section.py --list

Sections are the same names main()'s budget loop uses (e.g. ddpm_train,
classifier_ensemble_accum). Useful when a single new section needs a real
measured number without paying for a full ~18 min bench pass — e.g. to
refresh one key of BENCH_local.json after adding a section. Same caveats
as bench.py: run SOLO (1-core host, see CLAUDE.md), numbers are only
valid with nothing else running.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sections() -> dict:
    import bench

    return {
        "cpu_ddpm_baseline": bench._bench_cpu_ddpm_baseline,
        "ddpm_sample": bench._bench_ddpm_sample,
        "invert": bench._bench_invert,
        "input_pipeline": bench._bench_input_pipeline,
        "vqvae": bench._bench_vqvae,
        "ddpm_train": bench._bench_ddpm_train,
        "specunet": bench._bench_specunet,
        "classifier": lambda: bench._bench_classifier(capacity_batch=256),
        "acgan": bench._bench_acgan,
        "acgan_capacity": bench._bench_acgan_capacity,
        "serve_dpmpp": bench._bench_serve_dpmpp,
        "classifier_sweep": bench._bench_classifier_sweep,
        "classifier_ensemble_accum": bench._bench_classifier_ensemble_accum,
    }


def main(argv: list[str]) -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    table = _sections()
    if not argv or argv[0] == "--list":
        print("\n".join(table))
        return 0

    out: dict = {}
    seconds: dict = {}
    for name in argv:
        if name not in table:
            print(f"unknown section {name!r}; --list shows options", file=sys.stderr)
            return 2
        t0 = time.perf_counter()
        out.update(table[name]())
        seconds[name] = round(time.perf_counter() - t0, 1)
    out["section_seconds"] = seconds
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
