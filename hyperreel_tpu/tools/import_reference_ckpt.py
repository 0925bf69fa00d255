"""Import weights from a reference (facebookresearch/hyperreel) PyTorch
checkpoint into this framework's parameter tree.

The reference saves a pytorch-lightning checkpoint whose `state_dict` holds
the color net's factored grids as torch Parameters
(nlf/nets/tensorf_base.py:911-948 `init_one_svd`:
plane `[1, C, H, W]`, line `[1, C, L, 1]`;
nlf/nets/tensorf_dynamic.py:126-173: space plane `[1, C, H, W]`,
time plane `[1, C, F, W]`), basis matrices as `torch.nn.Linear` weights
(`[out, in]`), and MLPs as `layers.{i}.weight/bias`
(nlf/nets/mlp.py:125-154).

This framework stores grids channels-LAST (`[H, W, C]` planes, `[L, C]`
lines — see ops/grid_sample.py layout rationale) and Linear weights as
`[in, out]`, so the importer transposes on the way in. Key matching is
prefix-agnostic (lightning nests everything under
`render_fn.model.color_model.net.` etc.) — only the trailing component
names are matched.

Usage:
    from hyperreel_tpu.tools.import_reference_ckpt import (
        import_reference_checkpoint)
    params, report = import_reference_checkpoint("ref.ckpt", model, params)
"""

import re
from typing import Dict, Tuple

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _plane(t):
    """[1, C, H, W] -> [H, W, C]."""
    a = _to_numpy(t)
    return np.ascontiguousarray(a[0].transpose(1, 2, 0)).astype(np.float32)


def _line(t):
    """[1, C, L, 1] -> [L, C]."""
    a = _to_numpy(t)
    return np.ascontiguousarray(a[0, :, :, 0].T).astype(np.float32)


def _linear_w(t):
    """torch Linear weight [out, in] -> [in, out]."""
    return np.ascontiguousarray(_to_numpy(t).T).astype(np.float32)


# (regex on the key tail) -> (target path builder, converter)
_GRID_PATTERNS = [
    (re.compile(r"(?:^|\.)density_plane_space\.(\d+)$"),
     lambda i: ("density", f"space_{i}"), _plane),
    (re.compile(r"(?:^|\.)density_plane_time\.(\d+)$"),
     lambda i: ("density", f"time_{i}"), _plane),
    (re.compile(r"(?:^|\.)app_plane_space\.(\d+)$"),
     lambda i: ("app", f"space_{i}"), _plane),
    (re.compile(r"(?:^|\.)app_plane_time\.(\d+)$"),
     lambda i: ("app", f"time_{i}"), _plane),
    (re.compile(r"(?:^|\.)density_plane\.(\d+)$"),
     lambda i: ("density", f"plane_{i}"), _plane),
    (re.compile(r"(?:^|\.)density_line\.(\d+)$"),
     lambda i: ("density", f"line_{i}"), _line),
    (re.compile(r"(?:^|\.)app_plane\.(\d+)$"),
     lambda i: ("app", f"plane_{i}"), _plane),
    (re.compile(r"(?:^|\.)app_line\.(\d+)$"),
     lambda i: ("app", f"line_{i}"), _line),
]

_BASIS_PATTERNS = [
    (re.compile(r"(?:^|\.)basis_mat_density\.weight$"), "basis_mat_density"),
    (re.compile(r"(?:^|\.)basis_mat\.weight$"), "basis_mat"),
]


def _set(tree, path, value, report, src_key):
    node = tree
    for p in path[:-1]:
        if not isinstance(node, dict) or p not in node:
            report["skipped"].append((src_key, "/".join(path), "no target"))
            return
        node = node[p]
    leaf = path[-1]
    if not isinstance(node, dict) or leaf not in node:
        report["skipped"].append((src_key, "/".join(path), "no target"))
        return
    want = tuple(np.shape(node[leaf]))
    got = tuple(value.shape)
    if want != got:
        report["skipped"].append(
            (src_key, "/".join(path), f"shape {got} != {want}"))
        return
    node[leaf] = value
    report["mapped"].append((src_key, "/".join(path)))


def _collect_mlp_groups(state_dict):
    """Group `<prefix>.layers.{i}.weight/bias` keys by prefix, in key
    order (the reference's BaseMLP layer list, nlf/nets/mlp.py:125-166).
    Layers followed by an activation are wrapped in nn.Sequential
    (mlp.py:147-152), so their keys read `layers.{i}.0.weight`."""
    groups = {}
    for key in state_dict:
        m = re.search(r"^(.*)\.layers\.(\d+)(?:\.0)?\.(weight|bias)$", key)
        if m:
            groups.setdefault(m.group(1), {}).setdefault(
                int(m.group(2)), {})[m.group(3)] = key
    return groups


def _our_mlp_nodes(params):
    """Find {path: node} for every dict holding layer_{i} sub-dicts."""
    found = {}

    def walk(node, path):
        if isinstance(node, dict):
            if any(re.match(r"layer_\d+$", k) for k in node):
                found["/".join(path)] = node
            else:
                for k, v in node.items():
                    walk(v, path + [k])

    walk(params, [])
    return found


def import_reference_state_dict(state_dict: Dict, params: Dict
                                ) -> Tuple[Dict, Dict]:
    """Map a reference state_dict into a (copied) params tree.

    Returns (new_params, report) where report lists mapped and skipped
    keys. Matching is best-effort: grids and basis matrices match by
    name; MLPs match by in/out shape signature against the reference's
    `layers.{i}` groups.
    """
    import copy
    params = copy.deepcopy(params)
    report = {"mapped": [], "skipped": []}

    color = params.get("color", params)

    for key, val in state_dict.items():
        if getattr(val, "numel", lambda: 1)() == 0:
            # inactive-axis grids: torch registers [1, 0, H, W] params
            # for n_lamb entries of 0 (tensorf_dynamic init_svd) — no
            # weights to carry
            continue
        matched = False
        for pat, path_fn, conv in _GRID_PATTERNS:
            m = pat.search(key)
            if m:
                _set(color, path_fn(int(m.group(1))) , conv(val),
                     report, key)
                matched = True
                break
        if matched:
            continue
        for pat, name in _BASIS_PATTERNS:
            if pat.search(key):
                _set(color, (name, "w"), _linear_w(val), report, key)
                matched = True
                break

    # render MLP (MLPRender_Fea/PE: torch Sequential `mlp.{0,2,4}`,
    # reference tensorf_base.py:46-56) -> color/render/{l0,l1,l2}
    render_node = color.get("render")
    if isinstance(render_node, dict) and "l0" in render_node:
        for key in state_dict:
            m = re.search(r"(?:^|\.)mlp\.(\d+)\.(weight|bias)$", key)
            if not m:
                continue
            li = int(m.group(1)) // 2  # ReLUs occupy odd slots
            tgt = f"l{li}"
            if m.group(2) == "weight":
                _set(color, ("render", tgt, "w"),
                     _linear_w(state_dict[key]), report, key)
            else:
                _set(color, ("render", tgt, "b"),
                     _to_numpy(state_dict[key]).astype(np.float32),
                     report, key)

    # MLPs: match each reference layers-group to one of our layer_{i}
    # dicts by the (in, out) shape signature of every layer
    ref_groups = _collect_mlp_groups(state_dict)
    our_nodes = _our_mlp_nodes(params)
    for prefix, layers in ref_groups.items():
        sig = []
        for i in sorted(layers):
            w = _to_numpy(state_dict[layers[i]["weight"]])
            sig.append((w.shape[1], w.shape[0]))  # (in, out)
        target = None
        for path, node in our_nodes.items():
            ours = []
            for i in range(len(node)):
                if f"layer_{i}" not in node:
                    break
                ours.append(tuple(np.shape(node[f"layer_{i}"]["w"])))
            if ours == sig:
                target = (path, node)
                break
        if target is None:
            report["skipped"].append((prefix + ".layers.*", "?",
                                      f"no MLP with signature {sig}"))
            continue
        path, node = target
        for i in sorted(layers):
            node[f"layer_{i}"]["w"] = _linear_w(
                state_dict[layers[i]["weight"]])
            report["mapped"].append(
                (layers[i]["weight"], f"{path}/layer_{i}/w"))
            if "bias" in layers[i]:
                node[f"layer_{i}"]["b"] = _to_numpy(
                    state_dict[layers[i]["bias"]]).astype(np.float32)
                report["mapped"].append(
                    (layers[i]["bias"], f"{path}/layer_{i}/b"))
        del our_nodes[path]  # each target consumed once

    return params, report


def import_reference_checkpoint(path: str, model, params):
    """Load a reference .ckpt (pytorch-lightning) and map its weights."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return import_reference_state_dict(state_dict, params)
