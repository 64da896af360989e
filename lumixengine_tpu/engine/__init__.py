from lumixengine_tpu.engine.world import World, WorldState, INVALID_ENTITY  # noqa: F401
from lumixengine_tpu.engine.engine import Engine  # noqa: F401
