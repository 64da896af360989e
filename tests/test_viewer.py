import numpy as np

from lumixengine_tpu import app as app_mod
from lumixengine_tpu.renderer import viewer


def test_viewer_renders_scene_svg(tmp_path):
    from lumixengine_tpu.models import demo_scenes

    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=256)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    # add a GUI label on top
    gm = None
    runner.start()
    runner.run(2)
    out = viewer.render_svg(runner, str(tmp_path / "scene.svg"))
    svg = open(out).read()
    assert svg.startswith("<svg") and "</svg>" in svg
    assert svg.count("<circle") > 20  # visible instances drawn
    assert "frame 2" in svg
