from floodsr_tpu.engine.base import EngineBase, ModelIOContract
from floodsr_tpu.engine.jax_engine import EngineJAX
from floodsr_tpu.engine.providers import doctor_info, get_io_info, get_jax_info

__all__ = ["EngineBase", "ModelIOContract", "EngineJAX", "get_jax_info", "get_io_info", "doctor_info"]
