from .engine import TwoStageEngine, EngineConfig
from .tracker import Track, IOUTracker, TrackedObj, IOUTrackerConfig
from .export import export_regressor, load_exported, make_export_fn
from .wrappers import Detector, Regressor
from .quant import (calibrate, calibrate_engine, intercepting,
                    quantized_apply)

__all__ = ['TwoStageEngine', 'EngineConfig', 'Track', 'IOUTracker',
           'TrackedObj', 'IOUTrackerConfig', 'export_regressor',
           'load_exported', 'make_export_fn', 'Detector', 'Regressor',
           'calibrate', 'calibrate_engine', 'intercepting',
           'quantized_apply']
