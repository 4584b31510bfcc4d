"""The non-saturating accuracy benchmark (VERDICT r1: every measured metric
sat at 1.0000, so the cmAP/threshold/bootstrap machinery had never
discriminated anything).

Runs the FULL committed accuracy ladder (scripts/bench_accuracy.run_ladder:
train on the hard fixture set -> PTQ INT8 -> int16-shipped PTQ -> QAT ->
evaluate each artifact with default AND threshold-optimized operating
points) and gates EVERY row against the committed ACCURACY.json within
+/- 0.07 cmAP — a regression in any tier (float training, PTQ conversion,
exact int16 shipping, QAT) fails the suite, not just the float32 row
(round-3 VERDICT weakness #5).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.integration]

_REPO = Path(__file__).resolve().parents[1]


def _load_ladder_module():
    spec = importlib.util.spec_from_file_location(
        "bench_accuracy", _REPO / "scripts" / "bench_accuracy.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_accuracy_ladder_matches_committed(tmp_path):
    import os

    acc_path = _REPO / "ACCURACY.json"
    artifact = _load_ladder_module().run_ladder(tmp_path)
    if os.environ.get("ACCURACY_REGEN"):
        # Regeneration mode: the committed artifact MUST come from this
        # exact environment (tests/conftest.py backend config) — the
        # standalone script's config compiles subtly different numerics
        # and the short QAT fine-tune amplifies a ~0.05 float-row drift
        # past the gate. ACCURACY_REGEN=1 pytest tests/test_hard_benchmark.py
        acc_path.write_text(json.dumps(artifact, indent=1) + "\n")
        return

    assert acc_path.exists(), (
        "ACCURACY.json missing — regenerate with "
        "ACCURACY_REGEN=1 python -m pytest tests/test_hard_benchmark.py")
    committed = json.loads(acc_path.read_text())
    want = {r["artifact"]: r for r in committed["rows"]}
    got = {r["artifact"]: r for r in artifact["rows"]}

    assert set(got) == set(want) == {
        "float32", "int8_ptq", "int8_ptq_int16_io", "int8_qat"}
    for tag, row in got.items():
        drift = abs(row["cmAP"] - want[tag]["cmAP"])
        assert drift < 0.07, (
            f"{tag} cmAP {row['cmAP']:.3f} drifted {drift:.3f} from the "
            f"committed {want[tag]['cmAP']:.3f} (ACCURACY.json) — accuracy "
            "regression in this tier, or regenerate the ladder if the "
            "change is intentional")

    f32 = got["float32"]
    assert f32["roc_auc"] > 0.6, f"roc_auc at chance: {f32['roc_auc']:.3f}"
    # NOT saturated: -10 dB + distractor samples must keep the benchmark
    # discriminative. If this ever hits 1.0 the benchmark has stopped
    # being able to detect regressions — make it harder.
    assert f32["cmAP"] < 0.995, f"hard benchmark saturated: {f32['cmAP']:.3f}"

    # Exact int16 shipping really is exact on these PCM16 fixtures
    # (run_ladder raises if scores diverge; the artifact records it too).
    assert artifact["int16_io_matches_ptq_bitwise"] is True

    # The threshold-optimized operating point exists on every row, so the
    # "QAT recall at a fixed 0.5" claim stays comparable to "PTQ +
    # optimized thresholds" round over round.
    for tag, row in got.items():
        assert 0.0 <= row["f1_opt"] <= 1.0
        assert row["f1_opt"] >= row["f1"] - 0.05, (
            f"{tag}: optimized-threshold F1 {row['f1_opt']:.3f} far below "
            f"the fixed-0.5 F1 {row['f1']:.3f} — optimization broken")
