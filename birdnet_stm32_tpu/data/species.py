"""Species list utilities: load, save, dedupe, round-robin combine.

Behavioral parity with reference data/species.py:12-123.
"""

from __future__ import annotations

from pathlib import Path


def load_species_list(path: str | Path) -> list[str]:
    """One species per line; stripped, empties dropped."""
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Species list not found: {path}")
    species = [line.strip() for line in p.read_text(encoding="utf-8").splitlines() if line.strip()]
    if not species:
        raise ValueError(f"Species list is empty: {path}")
    return species


def save_species_list(species: list[str], path: str | Path) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("".join(f"{s}\n" for s in species), encoding="utf-8")


def open_species_list(path: str | Path) -> list[str]:
    """Load, dedupe (first occurrence wins), sort alphabetically."""
    species = load_species_list(path)
    unique = sorted(dict.fromkeys(species))
    if not unique:
        raise ValueError(f"Species list is empty after deduplication: {path}")
    return unique


def combine_species_lists(
    file_list: list[str | Path],
    output_file: str | Path,
    max_species: int | None = None,
) -> list[str]:
    """Round-robin merge of several lists, dedupe, cap, sort, save."""
    per_file: list[list[str]] = []
    for fname in file_list:
        entries = list(dict.fromkeys(load_species_list(fname)))
        per_file.append(entries)

    combined: list[str] = []
    queues = [list(e) for e in per_file]
    while any(queues):
        for q in queues:
            if q:
                combined.append(q.pop(0))
    combined = list(dict.fromkeys(combined))
    if max_species is not None:
        combined = combined[:max_species]
    combined.sort()
    save_species_list(combined, output_file)
    return combined
