"""Management-plane HTTP API (replaces the reference's Node dashboard backend).

The reference serves a separate Express app (src/web/server.js) whose status
endpoint scrapes the C++ server's *log files* by regex (server.js:198-248).
Here the management API lives in-process with direct access to live state:

    GET  /statusz, /api/server/status   live status JSON (engine, transport,
                                        sessions, latency percentiles)
    GET  /api/models                    list model files (server.js:318-330)
    POST /api/models/upload?name=...    upload .onnx/.npz/.pt; the SHA-256
                                        watcher hot-swaps it (server.js:340-362)
    GET  /api/logs                      list log files (server.js:266-280)
    GET  /api/logs/<name>               view one log, path-traversal guarded
                                        (server.js:283-315)
    POST /api/logs/upload?name=...      client log upload (server.js:182-195)
    GET  /api/client/version            client version info (server.js:251-263)

Implemented on asyncio streams — no web framework dependency. The dashboard
HTML itself is optional and not rebuilt; every consumer of the reference's
JSON API finds the same routes here.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
from typing import Callable, Dict, Optional, Tuple

from ..utils.logging import get_logger

log = get_logger("web")

_SAFE_NAME = re.compile(r"^[A-Za-z0-9._-]+$")
MAX_UPLOAD = 256 * 1024 * 1024
ALLOWED_MODEL_EXT = (".onnx", ".npz", ".pt", ".pth")

CLIENT_VERSION = {"version": "1.0.0", "min_supported": "1.0.0"}


class ManagementApi:
    def __init__(self, status_fn: Callable[[], Dict],
                 models_dir: str = "models", logs_dir: str = "logs") -> None:
        self.status_fn = status_fn
        self.models_dir = models_dir
        self.logs_dir = logs_dir

    # ------------------------------------------------------------- routing
    async def handle(self, method: str, path: str, body: bytes) -> Tuple[int, Dict]:
        url = urllib.parse.urlsplit(path)
        route = url.path.rstrip("/") or "/"
        query = dict(urllib.parse.parse_qsl(url.query))
        try:
            if method == "GET":
                if route in ("/", "/statusz", "/api/server/status"):
                    return 200, self.status_fn()
                if route == "/api/models":
                    return 200, self._list_models()
                if route == "/api/logs":
                    return 200, self._list_logs()
                if route.startswith("/api/logs/"):
                    return self._view_log(route[len("/api/logs/"):])
                if route == "/api/client/version":
                    return 200, CLIENT_VERSION
            elif method == "POST":
                if route == "/api/models/upload":
                    return self._upload_model(query.get("name", ""), body)
                if route == "/api/logs/upload":
                    return self._upload_log(query.get("name", ""), body)
            return 404, {"error": "not found"}
        except Exception as e:  # noqa: BLE001
            log.exception("management api error on %s %s", method, route)
            return 500, {"error": str(e)}

    # -------------------------------------------------------------- models
    def _list_models(self) -> Dict:
        models = []
        if os.path.isdir(self.models_dir):
            for name in sorted(os.listdir(self.models_dir)):
                p = os.path.join(self.models_dir, name)
                if os.path.isfile(p) and name.endswith(ALLOWED_MODEL_EXT):
                    models.append({"name": name, "size": os.path.getsize(p),
                                   "mtime": int(os.path.getmtime(p))})
        return {"models": models}

    def _upload_model(self, name: str, body: bytes) -> Tuple[int, Dict]:
        if not _SAFE_NAME.match(name or ""):
            return 400, {"error": "invalid model name"}
        if not name.endswith(ALLOWED_MODEL_EXT):
            return 400, {"error": f"model must be one of {ALLOWED_MODEL_EXT}"}
        if not body or len(body) > MAX_UPLOAD:
            return 400, {"error": "empty or oversized upload"}
        os.makedirs(self.models_dir, exist_ok=True)
        tmp = os.path.join(self.models_dir, name + ".uploading")
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(self.models_dir, name))
        log.info("model uploaded: %s (%d bytes)", name, len(body))
        return 200, {"ok": True, "name": name, "size": len(body)}

    # ---------------------------------------------------------------- logs
    def _list_logs(self) -> Dict:
        logs = []
        if os.path.isdir(self.logs_dir):
            for name in sorted(os.listdir(self.logs_dir)):
                p = os.path.join(self.logs_dir, name)
                if os.path.isfile(p):
                    logs.append({"name": name, "size": os.path.getsize(p)})
        return {"logs": logs}

    def _view_log(self, name: str) -> Tuple[int, Dict]:
        # Path-traversal guard (reference server.js:283-315).
        if not _SAFE_NAME.match(name):
            return 400, {"error": "invalid log name"}
        path = os.path.join(self.logs_dir, name)
        if not os.path.isfile(path):
            return 404, {"error": "log not found"}
        with open(path, "r", errors="replace") as f:
            content = f.read()[-1_000_000:]
        return 200, {"name": name, "content": content}

    def _upload_log(self, name: str, body: bytes) -> Tuple[int, Dict]:
        if not _SAFE_NAME.match(name or ""):
            return 400, {"error": "invalid log name"}
        if len(body) > MAX_UPLOAD:
            return 400, {"error": "oversized upload"}
        os.makedirs(self.logs_dir, exist_ok=True)
        with open(os.path.join(self.logs_dir, "upload_" + name), "wb") as f:
            f.write(body)
        return 200, {"ok": True}
