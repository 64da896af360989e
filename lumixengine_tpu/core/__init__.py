from lumixengine_tpu.core import math  # noqa: F401
from lumixengine_tpu.core.transform import Transform  # noqa: F401
