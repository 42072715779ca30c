from .replay import CameraFrame, ReplayReport, Sequence, StateSample, run_replay, synthetic_sequence
from .runtime import InferenceResult, SystemState, WVNRuntime
from .scheduler import Scheduler
