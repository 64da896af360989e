from lumixengine_tpu.renderer.model import Model, ModelBank, ModelRegistry, Skeleton  # noqa: F401
from lumixengine_tpu.renderer.render_module import RenderModule, RendererSystem, RenderState  # noqa: F401
