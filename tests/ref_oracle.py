"""Load selected pure functions from the reference source as test oracles.

The reference modules can't be imported wholesale (torchvision/timm deps not
in this image), so we AST-extract individual top-level function defs and exec
them in a minimal namespace. This keeps parity tests honest: the oracle IS the
reference's code, evaluated, never copied into the repo.
"""

import ast
import math
import os
import types

REF = "/root/reference"


def load_functions(relpath: str, names, extra_ns=None):
    """Extract top-level functions `names` from a reference source file."""
    path = os.path.join(REF, relpath)
    with open(path) as f:
        tree = ast.parse(f.read())
    wanted = [n for n in tree.body
              if isinstance(n, (ast.FunctionDef, ast.ClassDef))
              and n.name in names]
    missing = set(names) - {n.name for n in wanted}
    if missing:
        raise KeyError(f"{missing} not found in {relpath}")
    mod = ast.Module(body=wanted, type_ignores=[])
    ns = {"math": math}
    if extra_ns:
        ns.update(extra_ns)
    exec(compile(mod, path, "exec"), ns)
    return {name: ns[name] for name in names}


def slicing_oracle():
    from PIL import Image
    return load_functions(
        "src/openmatch/modeling/modeling_minicpmv/modeling_minicpmv.py",
        ["slice_image", "ensure_divide", "find_best_resize", "get_refine_size",
         "split_to_patches"],
        extra_ns={"Image": Image})


def sincos_oracle():
    import numpy as np
    return load_functions(
        "src/openmatch/modeling/modeling_minicpmv/resampler.py",
        ["get_2d_sincos_pos_embed", "get_2d_sincos_pos_embed_from_grid",
         "get_1d_sincos_pos_embed_from_grid"],
        extra_ns={"np": np})
