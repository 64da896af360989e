"""AssetCompiler watch+recompile (≙ editor/asset_compiler.h:38-48 — the half
that makes it a compiler rather than a cache) + FileSystemWatcher."""
import os
import time

from lumixengine_tpu.editor.asset_compiler import AssetCompiler, FileSystemWatcher


def _touch(path, content):
    with open(path, "w") as f:
        f.write(content)
    # mtime resolution guard
    os.utime(path, (time.time(), time.time() + 0.01 + _touch.n))
    _touch.n += 1


_touch.n = 0.0


def test_watcher_reports_changes(tmp_path):
    p = str(tmp_path / "a.txt")
    _touch(p, "one")
    w = FileSystemWatcher()
    w.watch(p)
    assert w.poll() == []
    _touch(p, "two")
    assert w.poll() == [p]
    assert w.poll() == []


def test_compile_caches_by_content_hash(tmp_path):
    p = str(tmp_path / "s.pat")
    _touch(p, "source-a")
    calls = []
    ac = AssetCompiler()
    ac.add_plugin("pat", lambda path, src: calls.append(path) or src.upper())
    out = ac.compile(p)
    assert out == b"SOURCE-A"
    ac.compile(p)
    assert len(calls) == 1  # content unchanged → cache hit


def test_change_triggers_recompile_and_version_bump(tmp_path):
    p = str(tmp_path / "s.pat")
    _touch(p, "v1")
    ac = AssetCompiler()
    ac.add_plugin("pat", lambda path, src: src.decode())
    compiled = []
    ac.on_compiled(lambda path, out: compiled.append(out))
    assert ac.compile(p) == "v1"
    v0 = ac.version(p)
    _touch(p, "v2")
    ac.poll()
    assert ac.get(p) == "v2"
    assert ac.version(p) == v0 + 1
    assert compiled == ["v1", "v2"]


def test_dependency_recompiles_product(tmp_path):
    lib = str(tmp_path / "common.pai")
    prod = str(tmp_path / "fx.pat")
    _touch(lib, "lib-1")
    _touch(prod, "import lib")
    ac = AssetCompiler()

    def compile_pat(path, src):
        with open(lib) as f:
            return (src.decode(), f.read())

    ac.add_plugin("pat", compile_pat)
    ac.register_dependency(prod, lib)
    assert ac.compile(prod)[1] == "lib-1"
    _touch(lib, "lib-2")
    ac.poll()
    assert ac.get(prod)[1] == "lib-2"  # product recompiled on dep change


def test_engine_frame_polls_compiler(tmp_path):
    from lumixengine_tpu.engine.engine import Engine

    p = str(tmp_path / "s.pat")
    _touch(p, "v1")
    engine = Engine()
    ac = AssetCompiler()
    ac.add_plugin("pat", lambda path, src: src.decode())
    engine.asset_compiler = ac
    ac.compile(p)
    _touch(p, "v2")
    engine.update_host(1 / 60)
    assert ac.get(p) == "v2"
