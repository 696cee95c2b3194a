from .tracker import KalmanTracker, MultiObjectTracker  # noqa: F401
from .engine import InferenceEngine, InferenceRequest, EngineResult  # noqa: F401
from .adapters import GameAdapter, get_adapter  # noqa: F401
