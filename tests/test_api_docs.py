"""docs/api.md stays in sync with the public API.

The reference publishes a generated per-module API reference
(docs/gen_ref_pages.py there); here scripts/gen_api_docs.py generates
docs/api.md and this test fails when the page is stale — which also
import-checks every module in the package.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", REPO / "scripts" / "gen_api_docs.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["gen_api_docs"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_api_page_is_current():
    gen = _load_generator()
    expected = gen.render()
    on_disk = (REPO / "docs" / "api.md").read_text()
    assert on_disk == expected, (
        "docs/api.md is stale — run `python scripts/gen_api_docs.py`")


def test_api_page_covers_key_symbols():
    text = (REPO / "docs" / "api.md").read_text()
    for sym in [
        "load_audio_window", "split_audio_into_chunks",  # audio
        "inputs_for_config", "stft_magnitude",           # ops
        "build_dscnn", "make_fused_classifier",          # models/serving
        "TFLiteGraph", "run_qat",                        # quant
        "train_model", "pool_scores",                    # training/eval
        "make_mesh",                                     # parallel
    ]:
        assert sym in text, f"{sym} missing from docs/api.md"
