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


def install_torchvision_stub():
    """Make the reference's vendored timm importable without torchvision.

    timm only needs torchvision at import time (transforms/datasets/ops
    surface); the ViT forward path never calls it. Installing a minimal stub
    lets the FULL reference composite (timm ViT + MiniCPMV + VisRAG_Ret) run
    as a torch oracle for end-to-end parity."""
    import importlib.machinery
    import sys
    import types

    if "torchvision" in sys.modules:
        return
    import torch

    def mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    tv = mod("torchvision")
    tv.__version__ = "0.0.0-stub"
    tr = mod("torchvision.transforms")
    trf = mod("torchvision.transforms.functional")

    class InterpolationMode:
        BICUBIC = "bicubic"; BILINEAR = "bilinear"; NEAREST = "nearest"
        BOX = "box"; HAMMING = "hamming"; LANCZOS = "lanczos"
        NEAREST_EXACT = "nearest-exact"

    trf.InterpolationMode = InterpolationMode
    tr.functional = trf
    tr.InterpolationMode = InterpolationMode

    class _T:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
                 "RandomResizedCrop", "RandomHorizontalFlip", "ColorJitter",
                 "ToPILImage", "PILToTensor", "RandomCrop", "RandomApply",
                 "RandomChoice", "RandomOrder", "Lambda", "RandomErasing",
                 "TrivialAugmentWide", "RandAugment", "AutoAugment"):
        setattr(tr, name, type(name, (_T,), {}))
    ops = mod("torchvision.ops")
    opsm = mod("torchvision.ops.misc")

    class FrozenBatchNorm2d(torch.nn.Module):
        pass

    opsm.FrozenBatchNorm2d = FrozenBatchNorm2d
    ops.misc = opsm
    ds = mod("torchvision.datasets")
    for name in ("CIFAR100", "CIFAR10", "MNIST", "KMNIST", "FashionMNIST",
                 "ImageFolder"):
        setattr(ds, name, type(name, (), {}))
    tv.transforms = tr
    tv.ops = ops
    tv.datasets = ds
    for m in (tv, tr, trf, ops, opsm, ds):
        sys.modules[m.__name__] = m


def reference_paths():
    """Put the reference's src + vendored timm on sys.path (idempotent)."""
    import sys
    for p in (os.path.join(REF, "timm_modified"), os.path.join(REF, "src")):
        if p not in sys.path:
            sys.path.insert(0, p)
