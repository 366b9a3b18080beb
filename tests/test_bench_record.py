"""Unit tests for bench.py's record assembly — the driver-contract layer.

The r3 official perf record was rc=124/parsed:null because the single final
JSON print never happened; r4 rebuilt the record machinery around cumulative
emits + prior-record backfill. These tests pin that machinery (pure
functions — no device, no timing):

  * fresh keys always win over the prior record,
  * backfilled keys carry explicit provenance (keys_from_prior_record),
  * run-specific meta from a prior record never leaks in,
  * derived ratios compute over the MERGED view (fresh chain ÷ pinned CPU),
  * skip/error/incomplete markers land in the record,
  * the record is one json.dumps-able line.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    # bench.py lives at the repo root (not in the package); import it by path
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()

PRIOR = {
    "metric": "wav->mel ...",
    "value": 7480.1,
    "unit": "specs/sec",
    "vs_baseline": 101.2,
    "ddpm_sampling_samples_per_sec_per_chip": 1.356,
    "cpu_reference_ddpm_samples_per_sec": 0.001125,
    "vqvae_train_mfu_pct": 73.0,
    "record_date": "2026-08-19",
    # run-specific meta that must NEVER backfill
    "backend": "tpu",
    "bench_elapsed_s": 999.0,
    "skipped_sections": ["acgan"],
    "keys_from_prior_record": ["bogus"],
    "section_seconds": {"mel": 1.0},
}


def _assemble(result, prior, **kw):
    args = dict(errors={}, skipped=[], section_seconds={}, elapsed_s=12.34,
                incomplete=False, backend="cpu")
    args.update(kw)
    return bench.assemble_record(result, prior, **args)


def test_prior_meta_is_stripped_by_loader(tmp_path):
    p = tmp_path / "BENCH_local.json"
    p.write_text(json.dumps(PRIOR))
    prior = bench.load_prior_record(str(p))
    for meta in ("backend", "bench_elapsed_s", "skipped_sections",
                 "keys_from_prior_record", "section_seconds"):
        assert meta not in prior
    assert prior["value"] == 7480.1  # headline keys survive as fallback
    assert prior["record_date"] == "2026-08-19"


def test_loader_missing_file_is_empty(tmp_path):
    assert bench.load_prior_record(str(tmp_path / "nope.json")) == {}


def test_fresh_keys_win_and_backfill_has_provenance(tmp_path):
    p = tmp_path / "BENCH_local.json"
    p.write_text(json.dumps(PRIOR))
    prior = bench.load_prior_record(str(p))
    fresh = {"value": 7500.0, "metric": "wav->mel ...", "unit": "specs/sec",
             "ddpm_sampling_samples_per_sec_per_chip": 1.40}
    out = _assemble(fresh, prior)
    assert out["value"] == 7500.0  # fresh wins
    assert out["ddpm_sampling_samples_per_sec_per_chip"] == 1.40
    assert out["vqvae_train_mfu_pct"] == 73.0  # backfilled
    backfilled = set(out["keys_from_prior_record"])
    assert "vqvae_train_mfu_pct" in backfilled
    assert "value" not in backfilled and "record_date" not in backfilled
    assert out["prior_record_date"] == "2026-08-19"
    assert "record_date" not in out


def test_derived_ratio_over_merged_view(tmp_path):
    p = tmp_path / "BENCH_local.json"
    p.write_text(json.dumps(PRIOR))
    prior = bench.load_prior_record(str(p))
    # fresh chain measurement + PINNED cpu baseline from the prior record
    out = _assemble({"ddpm_sampling_samples_per_sec_per_chip": 2.25}, prior)
    assert out["ddpm_vs_cpu_baseline"] == round(2.25 / 0.001125, 1)


def test_recomputed_derived_ratio_not_listed_as_prior(tmp_path):
    # a stale derived ratio in the prior record gets recomputed over the
    # merged view — it must not be claimed as prior-record provenance
    p = tmp_path / "BENCH_local.json"
    p.write_text(json.dumps({**PRIOR, "ddpm_vs_cpu_baseline": 99999.0}))
    prior = bench.load_prior_record(str(p))
    out = _assemble({"ddpm_sampling_samples_per_sec_per_chip": 2.25}, prior)
    assert out["ddpm_vs_cpu_baseline"] == round(2.25 / 0.001125, 1)
    assert "ddpm_vs_cpu_baseline" not in out["keys_from_prior_record"]
    assert "vqvae_train_mfu_pct" in out["keys_from_prior_record"]


def test_empty_prior_backfills_nothing():
    out = _assemble({"value": 1.0}, {})
    assert "keys_from_prior_record" not in out
    assert "prior_record_date" not in out


def test_markers_and_json_line():
    out = _assemble({"value": 1.0}, {}, errors={"mel": "Boom: x"},
                    skipped=["a", "b"], section_seconds={"mel": 3.14159},
                    incomplete=True, backend="tpu")
    assert out["errors"] == {"mel": "Boom: x"}
    assert out["skipped_sections"] == ["a", "b"]
    assert out["bench_incomplete"] is True
    assert out["section_seconds"] == {"mel": 3.1}
    assert out["bench_elapsed_s"] == 12.3
    assert out["backend"] == "tpu"
    line = json.dumps(out)
    assert "\n" not in line and json.loads(line) == out


def test_complete_run_has_no_incomplete_marker():
    out = _assemble({"value": 1.0}, {})
    assert "bench_incomplete" not in out
    assert "skipped_sections" not in out
    assert "errors" not in out


# --- slim stdout record (r5): the driver retains only the last 2,000 chars
# of output and json-parses the last line; the r4 official record was
# parsed:null because the verbose line was ~3.3k chars. These tests pin the
# compact form against the FULL current keyset.


def _worst_case_full_record():
    """The committed local record with every known key present plus maximal
    bookkeeping — an upper bound on what a real final line carries."""
    with open(os.path.join(REPO, "BENCH_local.json")) as f:
        full = json.load(f)
    # keys newer than the last local refresh must also fit
    full.setdefault(
        "classifier_ensemble_train_images_per_sec_per_chip_batch64_accum4", 123.456789)
    full.setdefault("classifier_ensemble_train_mfu_pct_batch64_accum4", 34.567891)
    full.update({
        "prior_record_date": "2026-08-19",
        "keys_from_prior_record": [f"key_{i}" for i in range(45)],
        "skipped_sections": [n for n, _, _ in bench.SECTIONS],
        "errors": {"mel": "RuntimeError: boom", "acgan": "ValueError: x"},
        "bench_incomplete": True,
        "section_seconds": {n: 12.3 for n, _, _ in bench.SECTIONS},
        "bench_elapsed_s": 1234.5,
        "backend": "tpu",
    })
    return full


def test_slim_line_fits_driver_tail_window():
    line = json.dumps(bench.slim_record(_worst_case_full_record()))
    assert "\n" not in line
    assert len(line) < 1800, f"slim line {len(line)} chars ≥ 1800 — driver tail risk"
    json.loads(line)  # parses


def test_slim_covers_every_metric_key():
    """No metric may vanish: every non-bookkeeping key of the full record is
    either a headline key, explicitly mapped, or an explicitly-documented
    dropped constant — anything else must surface under misc."""
    full = _worst_case_full_record()
    slim = bench.slim_record(full)
    short_values = []
    for g in slim:
        if isinstance(slim[g], dict) and g != "meta":
            short_values.extend(slim[g].values())
    for k, v in full.items():
        if k in bench._SLIM_META or k in bench._SLIM_DROP:
            continue
        if k in bench._HEADLINE_KEYS:
            assert k in slim
        elif isinstance(v, float):
            assert bench._sig4(v) in short_values, f"metric {k} missing from slim record"


def test_slim_keyset_has_no_surprises():
    """Every metric key the bench can currently produce has an explicit slim
    mapping — a new section key without one lands in misc (still parseable,
    still counted by the length test, but flagged here so the mapping and
    docs/BENCH_SCHEMA.md get updated)."""
    full = _worst_case_full_record()
    slim = bench.slim_record(full)
    assert "misc" not in slim, f"unmapped metric keys: {list(slim['misc'])}"


def test_slim_unmapped_key_survives_in_misc():
    slim = bench.slim_record({"value": 1.0, "brand_new_metric": 3.14159265})
    assert slim["misc"]["brand_new_metric"] == 3.142  # 4 sig digits


def test_slim_meta_counts_and_schema_pointer():
    slim = bench.slim_record(_worst_case_full_record())
    meta = slim["meta"]
    assert meta["backend"] == "tpu"
    assert meta["skipped"] == len(bench.SECTIONS)
    assert meta["errors"] == 2
    assert meta["backfilled_keys"] == 45
    assert meta["live_sections"] == len(bench.SECTIONS)
    assert meta["incomplete"] is True
    assert meta["prior"] == "2026-08-19"
    assert meta["schema"] == "docs/BENCH_SCHEMA.md"


def test_slim_headline_survives_verbatim():
    slim = bench.slim_record(_worst_case_full_record())
    assert slim["metric"].startswith("wav->mel")
    assert slim["unit"] == "specs/sec"
    assert isinstance(slim["value"], float) and isinstance(slim["vs_baseline"], float)


def test_load_prior_sections(tmp_path):
    p = tmp_path / "BENCH_local.json"
    p.write_text(json.dumps({"value": 1.0, "section_seconds": {"mel": 130.5}}))
    assert bench.load_prior_sections(str(p)) == {"mel": 130.5}
    assert bench.load_prior_sections(str(tmp_path / "nope.json")) == {}


def test_sections_registry_names_unique_and_complete():
    names = [n for n, _, _ in bench.SECTIONS]
    assert len(names) == len(set(names))
    # the split ddpm sections and the headline mel section are registered
    for required in ("mel", "ddpm_chain", "ddim", "dpmpp", "ddpm_train",
                     "classifier_ensemble_accum"):
        assert required in names
