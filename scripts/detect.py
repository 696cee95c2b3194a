#!/usr/bin/env python
"""Offline detection CLI: run a weight artifact over images / directories /
video files through the deployed inference functions (forward + DFL decode,
class-weighted NMS; host letterbox with the serving geometry and gray fill)
— no server required. Compute is f32 here; serving configs may run bf16, so
scores can differ at the last decimal near thresholds.

The reference had no offline tooling at all (detection only ran inside the
UDP server, src/server/main.cpp); this is the "try the model on a file"
surface its users get from ultralytics' own CLI:

    python scripts/detect.py --weights artifacts/yolov8n_trained_416.npz \
        photo.jpg frames_dir/ clip.mp4 [--save-dir out/] [--labels-dir lb/]

One JSON line per frame on stdout: {"source", "width", "height",
"detections": [{"class", "confidence", "cx", "cy", "w", "h"}]} with boxes
center-format, normalized to the ORIGINAL frame (the wire Detection
convention, protocol/packets.py). --save-dir writes annotated copies;
--labels-dir writes YOLO-convention label files next to nothing else, so a
directory of images becomes a self-labeled dataset (the offline twin of the
server's analytics.capture_dir flywheel).

Relay-safe: forces CPU by default (--platform tpu to opt in); a single
fixed batch shape -> exactly one XLA program.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def annotate(rgb, dets, names=None):
    import cv2
    out = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR).copy()
    h, w = out.shape[:2]
    for d in dets:
        x1 = int((d["cx"] - d["w"] / 2) * w)
        y1 = int((d["cy"] - d["h"] / 2) * h)
        x2 = int((d["cx"] + d["w"] / 2) * w)
        y2 = int((d["cy"] + d["h"] / 2) * h)
        cv2.rectangle(out, (x1, y1), (x2, y2), (0, 220, 0), 2)
        label = (names[d["class"]] if names and d["class"] < len(names)
                 else str(d["class"]))
        cv2.putText(out, f"{label} {d['confidence']:.2f}",
                    (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (0, 220, 0), 1, cv2.LINE_AA)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(
        description="offline detection over images/dirs/videos")
    ap.add_argument("inputs", nargs="+",
                    help="image files, image directories, video files")
    ap.add_argument("--weights", required=True, help=".npz/.pt/.onnx artifact")
    ap.add_argument("--size", type=int, default=416,
                    help="letterbox target (32-multiple)")
    ap.add_argument("--conf", type=float, default=0.5)
    ap.add_argument("--nms", type=float, default=0.45)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--video-stride", type=int, default=1,
                    help="process every Nth video frame")
    ap.add_argument("--save-dir", default="",
                    help="write annotated copies here (video sources write "
                         "ONE annotated .avi (MJPG) each instead of per-frame "
                         "stills; stride-skipped frames are omitted)")
    ap.add_argument("--labels-dir", default="",
                    help="write YOLO-convention label files here "
                         "(self-labeling a directory of images)")
    ap.add_argument("--names", default="",
                    help="comma-separated class names for annotations")
    ap.add_argument("--platform", default="cpu",
                    help="'cpu' (default, relay-safe) or 'tpu'")
    args = ap.parse_args()
    if args.size <= 0 or args.size % 32:
        raise SystemExit("--size must be a positive multiple of 32")
    if args.batch < 1 or args.video_stride < 1:
        raise SystemExit("--batch and --video-stride must be >= 1")

    import jax
    if args.platform and args.platform != "tpu":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from zero_latency_yolo_tpu.models.weights import (
        infer_spec_from_params, load_artifact,
    )
    from zero_latency_yolo_tpu.models.yolov8 import forward_decoded
    from zero_latency_yolo_tpu.ops import nms as nms_ops
    from zero_latency_yolo_tpu.runtime.media import iter_frames
    from zero_latency_yolo_tpu.train.data import letterbox_image

    try:
        params = load_artifact(args.weights)
    except ValueError as e:
        raise SystemExit(str(e))
    spec = infer_spec_from_params(params)
    names = [n.strip() for n in args.names.split(",")] if args.names else None
    cw = jnp.ones((spec.num_classes,), jnp.float32)
    size, batch = args.size, args.batch

    @jax.jit
    def run(x, scale, pad, wh):
        pred = forward_decoded(params, spec, x)
        return nms_ops.postprocess_batch(
            pred, cw, jnp.float32(args.conf), jnp.float32(args.nms),
            scale, pad, wh)

    for d in (args.save_dir, args.labels_dir):
        if d:
            os.makedirs(d, exist_ok=True)

    def flush(bufs):
        n = len(bufs)
        if not n:
            return
        x = np.zeros((batch, size, size, 3), np.float32)
        scale = np.ones((batch,), np.float32)
        pad = np.zeros((batch, 2), np.float32)
        wh = np.ones((batch, 2), np.float32)
        for i, (_src, rgb) in enumerate(bufs):
            # fill=114: the serving letterbox's gray pad (ops/preprocess
            # FILL) so offline confidences match what the server computes.
            lb, s, px, py = letterbox_image(rgb, size, fill=114)
            x[i] = lb.astype(np.float32) / 255.0
            scale[i] = s
            pad[i] = (px, py)
            wh[i] = (rgb.shape[1], rgb.shape[0])
        out = run(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(pad),
                  jnp.asarray(wh))
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        classes = np.asarray(out["classes"])
        counts = np.asarray(out["count"])
        for i, (src, rgb) in enumerate(bufs):
            k = int(counts[i])
            dets = [{
                "class": int(classes[i, j]),
                "confidence": round(float(scores[i, j]), 4),
                "cx": round(float(boxes[i, j, 0]), 6),
                "cy": round(float(boxes[i, j, 1]), 6),
                "w": round(float(boxes[i, j, 2]), 6),
                "h": round(float(boxes[i, j, 3]), 6),
            } for j in range(k)]
            print(json.dumps({"source": src,
                              "width": int(rgb.shape[1]),
                              "height": int(rgb.shape[0]),
                              "detections": dets}), flush=True)
            # Path-derived stem (separators -> "_"): same-named inputs from
            # different directories must not overwrite each other's labels.
            # rsplit + frame-prefix check (review r5): iter_frames names
            # video frames "<path>#frameN", but a literal '#' in a user's
            # FILE name (photo#1.jpg) must not route a still down the
            # video-writer path against a nonexistent capture.
            path_part, _, tail = src.rpartition("#")
            if path_part and tail.startswith("frame"):
                suffix = tail
            else:
                path_part, suffix = src, ""
            base = os.path.splitext(os.path.normpath(path_part))[0]
            base = base.replace(os.sep, "_").lstrip("._")
            stem = f"{base}_{suffix}" if suffix else base
            if args.save_dir:
                import cv2
                ann = annotate(rgb, dets, names)
                if suffix:
                    # Video frame: append to ONE annotated video per source
                    # (processed frames only; stride-skipped ones omitted).
                    vw = video_writers.get(path_part)
                    if vw is None:
                        cap = cv2.VideoCapture(path_part)
                        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                        cap.release()
                        fps = max(float(fps or 30.0) / args.video_stride, 1.0)
                        vw = cv2.VideoWriter(
                            os.path.join(args.save_dir,
                                         base + "_annotated.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), fps,
                            (rgb.shape[1], rgb.shape[0]))
                        video_writers[path_part] = vw
                    vw.write(ann)
                else:
                    cv2.imwrite(os.path.join(args.save_dir, stem + ".jpg"),
                                ann)
            if args.labels_dir:
                with open(os.path.join(args.labels_dir, stem + ".txt"),
                          "w") as f:
                    for d in dets:
                        f.write(f"{d['class']} {d['cx']:.6f} {d['cy']:.6f} "
                                f"{d['w']:.6f} {d['h']:.6f}\n")
        bufs.clear()

    bufs = []
    video_writers = {}
    n_frames = 0
    try:
        # Generator: decode errors surface during iteration.
        for src, rgb in iter_frames(args.inputs, args.video_stride):
            bufs.append((src, rgb))
            n_frames += 1
            if len(bufs) == batch:
                flush(bufs)
        flush(bufs)
    except ValueError as e:
        raise SystemExit(str(e))
    finally:
        for vw in video_writers.values():
            vw.release()
    if not n_frames:
        raise SystemExit("no decodable inputs found")
    return 0


if __name__ == "__main__":
    sys.exit(main())
