"""Weight persistence and checkpoint conversion.

Supports:
- native .npz round-trip of the param pytree (flat "m0/cv1/w"-style keys);
- ultralytics PyTorch state_dicts ("model.0.conv.weight", BN stats folded);
- ONNX files exported by the reference's start.sh:113-149 (ultralytics fuses
  Conv+BN before export, so initializers arrive pre-folded), read with a
  minimal vendored protobuf walker — the image has no `onnx` package.

If the configured model file is missing or unreadable the engine falls back to
simulation mode (reference behavior: src/inference/onnx_engine.cpp:70-75).
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .yolov8 import VARIANTS, ModelSpec, fold_batchnorm, get_spec, init_params

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Flat <-> nested pytree
# ---------------------------------------------------------------------------

def flatten(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, list):
        for i, v in enumerate(params):
            out.update(flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Params:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            missing = [str(i) for i in range(len(keys)) if str(i) not in node]
            if missing:
                # A filtered/optimized export with a gap (e.g. index 0
                # pruned) must say so, not KeyError into the blanket
                # simulation-mode fallback.
                raise ValueError(
                    f"non-contiguous indexed checkpoint entries: have "
                    f"{sorted(keys)}, missing {missing}")
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(params: Params, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flatten(params))


def load_params(path: str) -> Params:
    with np.load(path) as z:
        return unflatten({k: z[k] for k in z.files})


def load_artifact(path: str) -> Params:
    """Load a weight artifact by extension: .npz (native), .pt/.pth
    (ultralytics checkpoint/state_dict), .onnx (exported graph) — the one
    dispatch shared by every CLI that accepts `--weights`."""
    if path.endswith(".npz"):
        return load_params(path)
    if path.endswith((".pt", ".pth")):
        return load_torch_checkpoint(path)
    if path.endswith(".onnx"):
        return from_onnx(path)
    raise ValueError(f"unknown weight format: {path} "
                     "(expected .npz, .pt/.pth or .onnx)")


def file_sha256(path: str) -> str:
    """Model-file hash for the hot-reload watcher
    (reference src/inference/onnx_engine.cpp:1087-1124)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# ---------------------------------------------------------------------------
# ultralytics state_dict conversion
# ---------------------------------------------------------------------------

def _torch_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def from_ultralytics_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """Convert an ultralytics DetectionModel state_dict (numpy values, keys like
    'model.0.conv.weight' / 'model.22.cv2.0.1.bn.running_mean') into our pytree.
    BN blocks are folded; the DFL conv (fixed arange weights) is dropped since
    decode computes the expectation directly."""
    flat: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        if not key.startswith("model."):
            continue
        parts = key.split(".")
        idx = parts[1]
        rest = parts[2:]
        if rest[:1] == ["dfl"]:
            continue
        mapped = _map_ultra_path(rest)
        if mapped is None:
            continue
        arr = np.asarray(val)
        if mapped[-1] == "w" and arr.ndim == 4:
            arr = _torch_to_hwio(arr)
        flat[f"m{idx}/" + "/".join(mapped)] = arr
    params = unflatten(flat)
    return fold_batchnorm(_bn_arrays_to_tree(params))


def _map_ultra_path(rest: List[str]) -> Optional[List[str]]:
    """ultralytics module path -> our tree path.

    Conv block:      conv.weight -> w ; bn.{weight,bias,running_mean,running_var}
    C2f:             cv1/cv2 conv blocks, m.<i>.cv1/cv2
    Detect:          cv2.<lvl>.<j>.(conv|bn|weight|bias), j=2 is the bare Conv2d
    """
    bn_map = {"weight": "gamma", "bias": "beta",
              "running_mean": "mean", "running_var": "var"}
    out: List[str] = []
    i = 0
    while i < len(rest):
        tok = rest[i]
        if tok == "conv":
            out.append("w" if rest[i + 1] == "weight" else "b")
            return out
        if tok == "bn":
            stat = bn_map.get(rest[i + 1])
            if stat is None:
                return None  # num_batches_tracked
            out.extend(["bn", stat])
            return out
        if tok == "weight":  # bare Conv2d at detect head tip
            out.append("w")
            return out
        if tok == "bias":
            out.append("b")
            return out
        out.append(tok)
        i += 1
    return None


def _bn_arrays_to_tree(params: Params) -> Params:
    return params  # bn subdicts already nested by unflatten


def load_torch_checkpoint(path: str) -> Params:
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickled objects present
        # weights_only=False unpickles ARBITRARY code — and the dashboard's
        # model-upload + hot-reload watcher auto-load .pt files, so a
        # default-unsafe load here is remote code execution for anyone who
        # can reach the management port. Full ultralytics checkpoints
        # (pickled nn.Modules) need an explicit operator opt-in.
        if os.environ.get("ZLT_TRUST_PICKLE") == "1":
            obj = torch.load(path, map_location="cpu", weights_only=False)
        else:
            raise ValueError(
                f"{path} contains pickled objects (a full ultralytics "
                f"checkpoint?). Load only tensor checkpoints by default; "
                f"export a state_dict / .onnx instead, or set "
                f"ZLT_TRUST_PICKLE=1 if you trust this file. ({e})") from e
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        sd = obj["model"].float().state_dict()
    elif isinstance(obj, dict):
        sd = obj
    else:
        raise ValueError(f"unsupported checkpoint object in {path}")
    return from_ultralytics_state_dict(
        {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
         for k, v in sd.items()})


# ---------------------------------------------------------------------------
# Minimal ONNX initializer reader (protobuf wire format, no deps)
# ---------------------------------------------------------------------------

def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _walk_fields(buf: memoryview):
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 1:
            yield field, wire, bytes(buf[pos:pos + 8]); pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos:pos + ln]; pos += ln
        elif wire == 5:
            yield field, wire, bytes(buf[pos:pos + 4]); pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")


_ONNX_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
                7: np.int64, 10: np.float16, 11: np.float64}


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = np.float32
    name = ""
    raw = b""
    floats: List[float] = []
    for field, wire, val in _walk_fields(buf):
        if field == 1 and wire == 0:
            dims.append(val)
        elif field == 2 and wire == 0:
            dtype = _ONNX_DTYPES.get(val, np.float32)
        elif field == 4:
            if wire == 2:  # packed float_data
                floats.extend(struct.unpack(f"<{len(val) // 4}f", bytes(val)))
            elif wire == 5:
                floats.append(struct.unpack("<f", val)[0])
        elif field == 8 and wire == 2:
            name = bytes(val).decode("utf-8")
        elif field == 9 and wire == 2:
            raw = bytes(val)
    if raw:
        arr = np.frombuffer(raw, dtype=dtype).reshape(dims)
    elif floats:
        arr = np.asarray(floats, dtype=np.float32).reshape(dims)
    else:
        arr = np.zeros(dims, dtype=dtype)
    return name, arr


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()
    tensors: Dict[str, np.ndarray] = {}
    for field, wire, val in _walk_fields(memoryview(data)):
        if field == 7 and wire == 2:  # ModelProto.graph
            for gfield, gwire, gval in _walk_fields(val):
                if gfield == 5 and gwire == 2:  # GraphProto.initializer
                    name, arr = _parse_tensor(gval)
                    tensors[name] = arr
    return tensors


def from_onnx(path: str) -> Params:
    """Build params from an ultralytics-exported .onnx (Conv+BN pre-fused)."""
    tensors = read_onnx_initializers(path)
    flat: Dict[str, np.ndarray] = {}
    for name, arr in tensors.items():
        if not name.startswith("model.") or ".dfl." in name:
            continue
        parts = name.split(".")
        mapped = _map_ultra_path(parts[2:])
        if mapped is None:
            continue
        if mapped[-1] == "w" and arr.ndim == 4:
            arr = _torch_to_hwio(arr)
        flat[f"m{parts[1]}/" + "/".join(mapped)] = arr
    if not flat:
        raise ValueError(
            f"{path}: no recognizable YOLOv8 initializers "
            "(placeholder or graph-optimized export)")
    return unflatten(flat)


# ---------------------------------------------------------------------------
# Spec introspection: recover (depth, width, max_channels, nc) from weights
# ---------------------------------------------------------------------------

def _expected_shapes(spec: ModelSpec, folded: bool) -> Dict[str, Tuple[int, ...]]:
    # int seed + device=False => pure-NumPy init with NO H2D transfers:
    # this runs on the model-watcher thread (maybe_reload -> load_model),
    # where device traffic would put a second lane concurrent with the
    # batcher's dispatches — the single-device-lane discipline scheduler.py
    # documents (and a whole-model transfer through the relay is seconds,
    # repeated per candidate spec by infer_spec_from_params).
    ref = init_params(0, spec, folded=folded, device=False)
    return {k: tuple(np.shape(v)) for k, v in flatten(ref).items()}


def spec_shape_mismatch(params: Params, spec: ModelSpec) -> List[str]:
    """[] when the param tree fits the spec exactly; else human-readable
    diffs (missing / extra / wrong-shape keys), a few at most."""
    flat = {k: tuple(np.shape(v)) for k, v in flatten(params).items()}
    want = _expected_shapes(spec, folded=not any("/bn/" in k for k in flat))
    out = []
    for k in sorted(set(want) - set(flat)):
        out.append(f"missing {k}")
    for k in sorted(set(flat) - set(want)):
        out.append(f"unexpected {k}")
    for k in sorted(set(flat) & set(want)):
        if flat[k] != want[k]:
            out.append(f"{k}: file {flat[k]} != spec {want[k]}")
    return out[:8]


def infer_spec_from_params(params: Params) -> ModelSpec:
    """Recover the ModelSpec from a loaded param tree's landmark shapes —
    the TPU-side equivalent of the reference's ORT session introspection
    (src/inference/onnx_engine.cpp:957-1062 reads IO dims from the file):
    drop in any yolov8 size/class-count and serving adapts without config
    edits. Raises ValueError when the tree isn't a recognizable YOLOv8."""
    try:
        c64 = int(np.shape(params["m0"]["w"])[3])
        ladder = tuple(int(np.shape(params[m]["w"])[3])
                       for m in ("m1", "m3", "m5", "m7"))
        n3 = len(params["m2"]["m"])
        n6 = len(params["m4"]["m"])
        det = params["m22"]
        nc = int(np.shape(det["cv3"][0][2]["w"])[3])
        reg_max = int(np.shape(det["cv2"][0][2]["w"])[3]) // 4
    except (KeyError, IndexError, TypeError) as e:
        raise ValueError(f"not a YOLOv8 param tree: {e!r}") from e

    observed = (c64,) + ladder

    def fits(spec: ModelSpec) -> bool:
        from .yolov8 import _depth
        return (tuple(spec.ch(b) for b in (64, 128, 256, 512, 1024))
                == observed
                and _depth(3, spec.depth) == n3
                and _depth(6, spec.depth) == n6
                and not spec_shape_mismatch(params, spec))

    for name, (d, w, mc) in sorted(VARIANTS.items()):
        spec = ModelSpec(variant=name, num_classes=nc, depth=d, width=w,
                         max_channels=mc, reg_max=reg_max)
        if fits(spec):
            return spec
    # Parametric point: candidate widths inverted from EVERY ladder rung —
    # the stem alone (c64/64, 1/8 resolution) cannot recover widths like
    # 0.2 (divisible-rounding collides with 0.25); deeper rungs invert at
    # 1/64+ resolution and fits() is exact, so trying all candidates is
    # safe. Depth from the bottleneck counts, channel cap from the deepest
    # rung.
    from .yolov8 import _depth
    width_cands = []
    for c, base in zip(observed, (64, 128, 256, 512, 1024)):
        cand = c / base
        if cand not in width_cands:
            width_cands.append(cand)
    w = c64 / 64.0
    # Depth: counts give an equivalence class of multiples; prefer the
    # canonical representatives (n3/3, n6/6) so a d0.17 artifact reports
    # as d0.17, not the first grid point with the same rounded counts.
    d = next((round(dd, 2) for dd in [n3 / 3.0, n6 / 6.0] +
              [x / 100.0 for x in range(5, 201)]
              if _depth(3, round(dd, 2)) == n3
              and _depth(6, round(dd, 2)) == n6), None)
    for w in width_cands:
        for mc in (1024, int(round(observed[-1] / w))):
            if d is None:
                break
            name = f"yolov8-d{d:g}-w{w:g}-mc{mc}"
            spec = ModelSpec(variant=name, num_classes=nc, depth=d, width=w,
                             max_channels=mc, reg_max=reg_max)
            if fits(spec):
                return spec
    raise ValueError(
        f"params have an unrecognized geometry: stem {c64}, ladder "
        f"{ladder}, bottlenecks ({n3},{n6}), nc {nc}")


def load_model(path: str, variant: str = "yolov8n", num_classes: int = 4,
               seed: int = 0) -> Tuple[Params, ModelSpec, bool]:
    """Load weights from .npz/.pt/.onnx. Returns (params, spec, simulation).

    The configured (variant, num_classes) is validated against the file's
    actual geometry; on mismatch the spec is INFERRED from the weights
    (reference behavior: the ORT engine introspects the session, the config
    never has to repeat what the file knows). On any failure returns
    random-init params with simulation=True, mirroring the reference's
    graceful degradation to simulation mode.
    """
    import logging

    spec = get_spec(variant, num_classes)
    try:
        params = load_artifact(path)  # one extension dispatch, shared
        mismatch = spec_shape_mismatch(params, spec)
        if mismatch:
            inferred = infer_spec_from_params(params)
            logging.getLogger("zlt.weights").warning(
                "%s does not fit configured %s/nc=%d (%s) — serving the "
                "file's own geometry %s/nc=%d", path, variant, num_classes,
                mismatch[0], inferred.variant, inferred.num_classes)
            spec = inferred
        return params, spec, False
    except Exception as e:  # noqa: BLE001 — any failure => simulation mode
        logging.getLogger("zlt.weights").warning(
            "model %s not loadable (%s: %s) — simulation mode",
            path, type(e).__name__, e)
        # int seed => NumPy init, device=False => NO H2D transfer: this
        # path also runs on the model-watcher thread, and simulation mode
        # never dispatches these params anyway — a whole-model transfer
        # here would put a second device lane next to the batcher's (which
        # wedges a relayed TPU) for nothing (review r5).
        params = init_params(seed, spec, folded=True, device=False)
        return params, spec, True
