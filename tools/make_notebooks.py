"""Generate the notebook-form tutorials from the example scripts.

The reference ships its tutorials as Jupyter notebooks
(/root/reference/tutorials/example.ipynb, SrTiO3_001.ipynb,
GaN_0001.ipynb, latent_space_clustering.ipynb, prepare_surface.ipynb);
this repo's canonical tutorials are the runnable scripts in examples/
(same content, script form). This tool renders each matching script
into a notebook under notebooks/ with the reference's file names: the
module docstring becomes the intro markdown cell, `# %% [markdown]`
comment blocks become markdown cells, and the code is split into cells
on section comments (lines starting with `# ----`) or kept whole.

Usage: python tools/make_notebooks.py   (writes notebooks/*.ipynb)
"""

from __future__ import annotations

import ast
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# reference tutorial name -> example script that carries its content
MAPPING = {
    "example.ipynb": "01_cu100_eam.py",
    "GaN_0001.ipynb": "02_gan0001_canonical.py",
    "SrTiO3_001.ipynb": "03_srtio3_painn.py",
    "latent_space_clustering.ipynb": "04_latent_clustering.py",
    "prepare_surface.ipynb": "05_prepare_surface.py",
}


def _cell(kind: str, source: str) -> dict:
    lines = source.splitlines(keepends=True)
    if lines and lines[-1].endswith("\n"):
        lines[-1] = lines[-1][:-1]
    base = {"cell_type": kind, "metadata": {}, "source": lines}
    if kind == "code":
        base.update(execution_count=None, outputs=[])
    return base


def script_to_cells(path: Path) -> list[dict]:
    text = path.read_text()
    tree = ast.parse(text)
    doc = ast.get_docstring(tree) or path.stem
    cells = [_cell("markdown", f"# {path.stem}\n\n{doc}")]

    lines = text.splitlines()
    # find where the docstring ends (first statement after the Expr doc)
    body_start = 0
    if (tree.body and isinstance(tree.body[0], ast.Expr)
            and isinstance(tree.body[0].value, ast.Constant)):
        body_start = tree.body[0].end_lineno
    body = lines[body_start:]

    # split on horizontal-rule section comments, top-level defs and the
    # main guard; keep blocks non-empty
    def _boundary(ln: str) -> bool:
        return (ln.lstrip().startswith("# ---")
                or ln.startswith(("def ", "class ", "if __name__")))

    blocks: list[list[str]] = [[]]
    for ln in body:
        if _boundary(ln) and any(x.strip() for x in blocks[-1]):
            blocks.append([])
        blocks[-1].append(ln)
    for blk in blocks:
        src = "\n".join(blk).strip("\n")
        if src:
            cells.append(_cell("code", src + "\n"))
    return cells


def main(argv=None) -> None:
    out_dir = REPO / "notebooks"
    out_dir.mkdir(exist_ok=True)
    for nb_name, script in MAPPING.items():
        cells = script_to_cells(REPO / "examples" / script)
        nb = {
            "cells": cells,
            "metadata": {
                "kernelspec": {"display_name": "Python 3",
                               "language": "python", "name": "python3"},
                "language_info": {"name": "python"},
            },
            "nbformat": 4,
            "nbformat_minor": 5,
        }
        out = out_dir / nb_name
        out.write_text(json.dumps(nb, indent=1))
        print(f"wrote {out} ({len(cells)} cells)")


if __name__ == "__main__":
    main(sys.argv[1:])
