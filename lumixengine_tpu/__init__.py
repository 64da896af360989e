"""lumixengine_tpu — a TPU-native simulation engine.

A from-scratch rebuild of the capabilities of nem0/LumixEngine's runtime
(reference: /root/reference) designed for TPU hardware: the World/entity
store is a pytree of SoA jax arrays, the per-frame tick is one jitted
``step(state, dt) -> state`` function, thousands of independent worlds are
vmapped for batch throughput and sharded across chips with ``shard_map``.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):

- ``core``      — math (quat/transform SoA ops), time, hashing, tokenizer,
                  logging, profiler counters, config.   (≙ src/core)
- ``engine``    — World builder + WorldState pytree, Engine step
                  composition, plugin framework, reflection registry,
                  serialization, prefabs, resources.    (≙ src/engine)
- ``ops``       — the jitted/Pallas kernels: hierarchy level-scan,
                  frustum cull, clip sampling, pose compose, skinning,
                  IK, rigid-body pipeline, particle kernels.
- ``renderer``  — culling system, render module, particle system +
                  compiler, model/pose, pipeline (sort keys, LOD,
                  draw-data extraction).                (≙ src/renderer)
- ``animation`` — clips, animation module, controller graphs.
- ``physics``   — XLA-native rigid-body module (replaces PhysX).
- ``parallel``  — device mesh / shard_map over the world-batch axis.
- ``models``    — procedural demo scenes (the benchmark configs).
- ``utils``     — tree/bench helpers.
"""

__version__ = "0.1.0"
