"""CLI flag-parity audit: every reference flag exists here or is explained.

Walks the reference's argparse surface (reference birdnet_stm32/cli/*.py,
AST parse only — the reference tree is untrusted and is never imported or
executed) and checks that each `--flag` either exists on the corresponding
verb here or is listed in INTENTIONAL with the reason it has no TPU
analog. Extra flags on our side are reported informationally (the
framework adds TPU-specific surface: meshes, bf16 serving, caching,
pipelining) but never fail the audit.

Run: python scripts/audit_cli_parity.py   (exit 1 on unexplained misses)
Wired into the suite as tests/test_cli.py::test_flag_parity_audit.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF_CLI = Path("/root/reference/birdnet_stm32/cli")
OUR_CLI = REPO / "birdnet_stm32_tpu" / "cli"

# Verbs with a same-named counterpart. (Our extra verbs — benchmark,
# profile, serve — have no reference parser to diff against.)
VERBS = ["train", "convert", "evaluate", "deploy", "board_test"]

# Reference flags with no TPU analog, each with the reason. The deploy
# layer's vendor-toolchain paths drive ST's stedgeai/X-CUBE-AI/CubeIDE
# binaries (reference deploy/config.py:45-49, deploy/stedgeai.py:65-135);
# the TPU deploy analog builds self-contained bundles + firmware headers
# and validates on-device through JAX, so there is no external toolchain
# to point at (COVERAGE.md "stedgeai wrapper" row).
INTENTIONAL: dict[str, dict[str, str]] = {
    "deploy": {
        "--stedgeai_path": "ST code-generator binary path (no vendor toolchain on TPU)",
        "--x_cube_ai_path": "X-CUBE-AI install root (no vendor toolchain on TPU)",
        "--cubeide_path": "STM32CubeIDE path for n6_loader (no vendor toolchain on TPU)",
        "--arm_toolchain_path": "arm-none-eabi-gcc path (nothing is cross-compiled)",
        "--n6_loader_config": "flash-loader JSON for the N6 boot path (no board flash step)",
        "--workspace_dir": "stedgeai scratch workspace (bundle build uses --output_dir)",
    },
}


def flags_of(path: Path) -> set[str]:
    """All --flag strings passed to add_argument in a CLI module (AST only)."""
    out: set[str] = set()
    for node in ast.walk(ast.parse(path.read_text())):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            for a in node.args:
                if isinstance(a, ast.Constant) and isinstance(a.value, str) \
                        and a.value.startswith("--"):
                    out.add(a.value)
    return out


def audit(verbose: bool = True) -> list[str]:
    """Returns unexplained reference-only flags as 'verb --flag' strings."""
    problems: list[str] = []
    for verb in VERBS:
        ref = flags_of(REF_CLI / f"{verb}.py")
        here = flags_of(OUR_CLI / f"{verb}.py")
        missing = sorted(ref - here)
        explained = INTENTIONAL.get(verb, {})
        if verbose:
            print(f"[{verb}] reference {len(ref)} flags, here {len(here)}; "
                  f"reference-only: {len(missing)}")
        for flag in missing:
            if flag in explained:
                if verbose:
                    print(f"  intentional {flag}: {explained[flag]}")
            else:
                problems.append(f"{verb} {flag}")
                if verbose:
                    print(f"  MISSING {flag} (unexplained)")
        stale = sorted(set(explained) - set(missing))
        for flag in stale:
            problems.append(f"{verb} {flag} (INTENTIONAL entry is stale — "
                            f"flag now exists or left the reference)")
    return problems


def main() -> int:
    problems = audit(verbose=True)
    if problems:
        print("\nFlag-parity audit FAILED:")
        for p in problems:
            print(f"  {p}")
        return 1
    print("\nFlag-parity audit OK: every reference flag is present or "
          "explained.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
