"""Profile CLI: analytical per-layer cost table for a config or checkpoint.

Parity with reference models/profiler.py:142-223 via the profile printer in
models/profiler.py.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def get_args(argv=None):
    p = argparse.ArgumentParser("birdnet_stm32_tpu profile")
    p.add_argument("--config_path", default=None, help="model_config.json")
    p.add_argument("--model_path", default=None, help="checkpoint dir (uses its config)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = get_args(argv)

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.profiler import check_n6_compatibility, print_profile

    if args.config_path:
        cfg = ModelConfig.load(args.config_path)
    elif args.model_path:
        mp = Path(args.model_path)
        if mp.suffix == ".keras":
            # Same .keras -> run-dir / sidecar mapping the train and
            # evaluate verbs apply, so the documented flow works verbatim.
            from birdnet_stm32_tpu.training.checkpoint import keras_run_dir

            run = keras_run_dir(mp)
            sidecar = mp.with_name(mp.stem + "_model_config.json")
            if run is not None:
                mp = run
            elif sidecar.exists():
                cfg = ModelConfig.load(sidecar)
                print_profile(cfg)
                for w in check_n6_compatibility(cfg):
                    print(f"[warn] {w}")
                return 0
        cfg = ModelConfig.load(Path(mp) / "model_config.json")
    else:
        raise SystemExit("need --config_path or --model_path")

    print_profile(cfg)
    for w in check_n6_compatibility(cfg):
        print(f"[warn] {w}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
