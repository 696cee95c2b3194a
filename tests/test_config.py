"""Config schema compatibility tests against the reference configs/server.json."""

import json

from zero_latency_yolo_tpu.config import (
    CS16_CLASS_NAMES, GameConfig, ServerConfig,
)

REFERENCE_JSON = """
{
    "model_path": "models/yolo_nano_cs16.onnx",
    "port": 7788,
    "web_port": 3000,
    "max_clients": 10,
    "target_fps": 60,
    "confidence_threshold": 0.5,
    "nms_threshold": 0.45,
    "max_queue_size": 8,
    "use_cpu_affinity": true,
    "cpu_core_id": 0,
    "use_high_priority": true,
    "logging": {"enable_logging": true, "log_level": "info",
                "log_file": "logs/server.log", "max_log_size_mb": 10,
                "max_log_files": 5},
    "network": {"recv_buffer_size": 1048576, "send_buffer_size": 1048576,
                "timeout_ms": 5000, "heartbeat_interval_ms": 1000},
    "detection": {"model_width": 416, "model_height": 416,
                  "enable_tracking": true, "max_tracking_age_ms": 500,
                  "class_weights": {"player_t": 1.0, "player_ct": 1.0,
                                    "head": 1.2, "weapon": 0.8}},
    "game_adapters": {"cs16": {"enabled": true, "aim_target_offset_y": -0.15,
                               "head_size_factor": 0.7,
                               "weapons": {"ak47": {"recoil_factor": 2.5, "priority": 1.0},
                                           "awp": {"recoil_factor": 0.0, "priority": 1.5}}}},
    "analytics": {"enable_analytics": true, "stats_interval_sec": 60,
                  "save_stats_to_file": true, "stats_file": "logs/stats.json"}
}
"""


def test_reference_schema_loads():
    cfg = ServerConfig.from_json(REFERENCE_JSON)
    assert cfg.model_path == "models/yolo_nano_cs16.onnx"
    assert cfg.network.port == 7788 and cfg.network.web_port == 3000
    assert cfg.max_clients == 10 and cfg.target_fps == 60
    assert cfg.confidence_threshold == 0.5 and cfg.nms_threshold == 0.45
    assert cfg.detection.model_width == 416
    assert cfg.detection.enable_tracking and cfg.detection.max_tracking_age_ms == 500
    assert cfg.detection.class_weights["head"] == 1.2
    cs16 = cfg.game_adapters["cs16"]
    assert cs16.enabled and cs16.head_size_factor == 0.7
    assert cs16.weapons["awp"].priority == 1.5
    # Weapons present in defaults but not in file keep their defaults.
    assert cs16.weapons["deagle"].recoil_factor == 3.0
    assert cfg.analytics.stats_interval_sec == 60


def test_all_fields_optional_with_defaults():
    cfg = ServerConfig.from_json("{}")
    assert cfg.network.port == 7788
    assert cfg.detection.model_width == 416
    assert cfg.confidence_threshold == 0.5
    assert cfg.game_adapters["cs16"].enabled
    assert cfg.tpu.batch_window_ms > 0


def test_class_weight_vector_order_and_defaults():
    cfg = ServerConfig.from_json(REFERENCE_JSON)
    vec = cfg.detection.class_weight_vector(CS16_CLASS_NAMES)
    assert vec == [1.0, 1.0, 1.2, 0.8]
    cfg.detection.class_weights.pop("weapon")
    assert cfg.detection.class_weight_vector(CS16_CLASS_NAMES)[3] == 1.0


def test_save_load_roundtrip(tmp_path):
    path = tmp_path / "server.json"
    cfg = ServerConfig.from_json(REFERENCE_JSON)
    cfg.tpu.quantize_int8 = True
    cfg.save(str(path))
    cfg2 = ServerConfig.load(str(path))
    assert cfg2.to_dict() == cfg.to_dict()
    # The saved file keeps top-level port aliases the reference expects.
    saved = json.loads(path.read_text())
    assert saved["port"] == 7788 and saved["web_port"] == 3000


def test_autocreate_default_config(tmp_path):
    path = tmp_path / "nested" / "server.json"
    cfg = ServerConfig.load(str(path), create_if_missing=True)
    assert path.exists()
    assert cfg.network.port == 7788


def test_unknown_game_adapter_accepted():
    cfg = ServerConfig.from_dict(
        {"game_adapters": {"csgo": {"enabled": True, "head_size_factor": 0.6}}})
    assert isinstance(cfg.game_adapters["csgo"], GameConfig)
    assert cfg.game_adapters["csgo"].head_size_factor == 0.6
    assert cfg.game_adapters["cs16"].enabled  # default preserved


def test_json_numeric_coercion():
    """JSON 60.0 for an int field (or 1 for a float field) must coerce to the
    declared type — ServerInfo struct packing requires real ints."""
    from zero_latency_yolo_tpu.config import ServerConfig
    cfg = ServerConfig.from_dict({
        "target_fps": 60.0, "max_clients": 8.0,
        "confidence_threshold": 1,
        "network": {"timeout_ms": 5000.0},
    })
    assert cfg.target_fps == 60 and isinstance(cfg.target_fps, int)
    assert isinstance(cfg.max_clients, int)
    assert isinstance(cfg.confidence_threshold, float)
    assert isinstance(cfg.network.timeout_ms, int)
    # The handshake packet this crashed in round-2 loadtest bring-up:
    from zero_latency_yolo_tpu.protocol import ServerInfo, ServerInfoPacket
    ServerInfoPacket(info=ServerInfo(
        server_id=1, model_version=1.0, max_clients=cfg.max_clients,
        max_fps=cfg.target_fps, status=0)).serialize()


def test_malformed_game_adapter_entry_tolerated():
    from zero_latency_yolo_tpu.config import ServerConfig
    cfg = ServerConfig.from_dict({"game_adapters": {"cs16": True,
                                                    "csgo": {"enabled": True}}})
    assert cfg.game_adapters["csgo"].enabled


def test_bool_string_coercion():
    """bool('false') is True — string booleans must parse by meaning
    (use_cpu_affinity defaults True, so 'false' flipping it proves it)."""
    from zero_latency_yolo_tpu.config import ServerConfig
    cfg = ServerConfig.from_dict({
        "use_cpu_affinity": "false",
        "tpu": {"dot1x1": "true"},
    })
    assert cfg.use_cpu_affinity is False
    assert cfg.tpu.dot1x1 is True
    # Garbage strings keep the default rather than truthy-ing to True.
    cfg2 = ServerConfig.from_dict({"tpu": {"dot1x1": "maybe"}})
    assert cfg2.tpu.dot1x1 is False  # default preserved


def test_tpu_enum_values_validated():
    """Layout/impl enum typos must fail at load, not silently serve the
    default layout (tpu.c2f="Split" would otherwise quietly disable the
    measured batch-32 win with no error)."""
    import pytest
    from zero_latency_yolo_tpu.config import ServerConfig
    for field, bad in [("c2f", "Split"), ("c2f", "splt"),
                       ("select", "perLevel"), ("nms", "cuda"),
                       ("act", "fused"), ("stem", "space2depth"),
                       ("preprocess", "resize"), ("dtype", "fp16")]:
        with pytest.raises(ValueError, match=f"tpu.{field}"):
            ServerConfig.from_dict({"tpu": {field: bad}})
    # All legal values load.
    cfg = ServerConfig.from_dict({"tpu": {
        "c2f": "split", "select": "perlevel", "nms": "xla",
        "act": "pallas_interpret", "stem": "s2d",
        "preprocess": "stretch", "dtype": "float32"}})
    assert cfg.tpu.c2f == "split" and cfg.tpu.select == "perlevel"


def test_load_time_gates_reject_bad_values():
    """Fail-at-load, not at first trace: NaN/oversized thresholds, non-32
    model sizes, malformed buckets, numeric strings, and unreachable
    adaptive ladders are all rejected (or coerced) by from_dict."""
    import math

    import pytest

    from zero_latency_yolo_tpu.config import ServerConfig

    with pytest.raises(ValueError, match="confidence_threshold"):
        ServerConfig.from_dict({"confidence_threshold": math.nan})
    with pytest.raises(ValueError, match="nms_threshold"):
        ServerConfig.from_dict({"nms_threshold": 5.0})
    with pytest.raises(ValueError, match="multiple of 32"):
        ServerConfig.from_dict({"detection": {"model_width": 400,
                                              "model_height": 400}})
    with pytest.raises(ValueError, match="batch_buckets"):
        ServerConfig.from_dict({"tpu": {"batch_buckets": []}})
    with pytest.raises(ValueError, match="frame_buckets"):
        ServerConfig.from_dict({"tpu": {"frame_buckets": [[600, 800, 3]]}})
    with pytest.raises(ValueError, match="adaptive_slo_ms"):
        ServerConfig.from_dict({"tpu": {"adaptive_slo_ms": math.nan,
                                        "serve_sizes": [320]}})
    # A ladder whose only extra rung exceeds model_width is unreachable
    # (the engine drops it) — the gate must see through that.
    with pytest.raises(ValueError, match="not above"):
        ServerConfig.from_dict({
            "detection": {"model_width": 416, "model_height": 416},
            "tpu": {"adaptive_slo_ms": 10.0, "serve_sizes": [512]}})
    # Numeric strings parse by meaning; junk raises.
    cfg = ServerConfig.from_dict({"target_fps": "60", "max_clients": "10"})
    assert cfg.target_fps == 60 and cfg.max_clients == 10
    with pytest.raises(ValueError, match="not a number"):
        ServerConfig.from_dict({"target_fps": "sixty"})


def test_gc_tune_and_switch_interval_gates():
    """tpu.gc_tune coerces bool-strings by meaning; the GIL switch interval
    is NaN-proof range-gated at load (a NaN would silently disable the GIL
    tuning; a huge value would wreck thread scheduling)."""
    import math

    import pytest

    from zero_latency_yolo_tpu.config import ServerConfig

    cfg = ServerConfig.from_dict({"tpu": {"gc_tune": "false"}})
    assert cfg.tpu.gc_tune is False
    cfg = ServerConfig.from_dict({"tpu": {"gc_tune": "true",
                                          "gil_switch_interval_ms": "1.5"}})
    assert cfg.tpu.gc_tune is True
    assert cfg.tpu.gil_switch_interval_ms == 1.5
    with pytest.raises(ValueError, match="gil_switch_interval_ms"):
        ServerConfig.from_dict({"tpu": {"gil_switch_interval_ms": math.nan}})
    with pytest.raises(ValueError, match="gil_switch_interval_ms"):
        ServerConfig.from_dict({"tpu": {"gil_switch_interval_ms": -1}})
    with pytest.raises(ValueError, match="gil_switch_interval_ms"):
        ServerConfig.from_dict({"tpu": {"gil_switch_interval_ms": 500}})


def test_bind_address_gates():
    from zero_latency_yolo_tpu.config import ServerConfig
    cfg = ServerConfig.from_dict({})
    assert cfg.network.bind_address == "0.0.0.0"
    assert cfg.network.web_bind_address == "0.0.0.0"
    cfg = ServerConfig.from_dict(
        {"network": {"bind_address": "127.0.0.1",
                     "web_bind_address": "10.0.0.5"}})
    assert cfg.network.bind_address == "127.0.0.1"
    assert cfg.network.web_bind_address == "10.0.0.5"
    import pytest
    # "127.1" is the aton-shorthand trap: inet_aton accepts it but the
    # native tier's inet_pton does not — the gate must reject it too.
    for bad in ("example.com", "::1", "256.1.2.3 junk", "127.1", 17):
        with pytest.raises(ValueError):
            ServerConfig.from_dict({"network": {"bind_address": bad}})
    with pytest.raises(ValueError):
        ServerConfig.from_dict({"network": {"web_bind_address": "nope"}})


def test_web_auth_token_gates():
    from zero_latency_yolo_tpu.config import ServerConfig
    assert ServerConfig.from_dict({}).network.web_auth_token == ""
    cfg = ServerConfig.from_dict(
        {"network": {"web_auth_token": "hunter2hunter2"}})
    assert cfg.network.web_auth_token == "hunter2hunter2"
    import pytest
    for bad in ("short", "has space8", 12345678):
        with pytest.raises(ValueError, match="web_auth_token"):
            ServerConfig.from_dict({"network": {"web_auth_token": bad}})
    # Non-ASCII survives JSON but travels in an HTTP header — the operator
    # would lock themselves out of every authenticated POST (ADVICE r3).
    with pytest.raises(ValueError, match="printable ASCII"):
        ServerConfig.from_dict({"network": {"web_auth_token": "sécret-token"}})
    # The shipped example placeholder is publicly known: fail-closed on
    # the exact token and the CHANGE-ME… prefix form.
    for placeholder in ("CHANGE-ME-32-chars-minimum-random",
                        "change_me_please_1"):
        with pytest.raises(ValueError, match="placeholder"):
            ServerConfig.from_dict(
                {"network": {"web_auth_token": placeholder}})
    # …but NOT on a legitimate random secret that merely CONTAINS the
    # phrase (ADVICE r4: the substring scan false-positived here).
    cfg2 = ServerConfig.from_dict(
        {"network": {"web_auth_token": "my-change_me-token"}})
    assert cfg2.network.web_auth_token == "my-change_me-token"
