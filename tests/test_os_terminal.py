"""Terminal platform backend (≙ the reference's real OS backends pumping
platform input and presenting frames — core/os_terminal.py)."""
import io

import numpy as np

from lumixengine_tpu.core.os import EventType, OSLayer
from lumixengine_tpu.core.os_terminal import TerminalWindowBackend


def _backend(out=None):
    be = TerminalWindowBackend(out=out or io.StringIO())
    be._raw_fd = None          # no tty in tests; feed via monkeypatched read
    return be


def test_key_parse_press_release_and_text():
    be = _backend()
    be._read_pending = lambda: "w\x1b[A"
    evs = be.poll()
    keys = [(e.keycode, e.down) for e in evs if e.type == EventType.KEY]
    assert (ord("W"), True) in keys            # letter press, VK-style code
    assert (0x26, True) in keys                # up arrow
    texts = [e.text for e in evs if e.type == EventType.TEXT_INPUT]
    assert texts == ["w"]                      # WM_CHAR analog
    be._read_pending = lambda: ""
    ups = [(e.keycode, e.down) for e in be.poll() if e.type == EventType.KEY]
    assert (ord("W"), False) in ups and (0x26, False) in ups


def test_ctrl_c_quits_through_os_layer():
    be = _backend()
    be._read_pending = lambda: "\x03"
    osl = OSLayer(be)
    osl.process_events()
    assert osl.quit_requested


def test_keys_reach_input_system():
    from lumixengine_tpu.engine import input as inp

    be = _backend()
    be._read_pending = lambda: "d"
    osl = OSLayer(be)
    isys = inp.InputSystem()
    osl.process_events(isys)
    isys.update()                          # frame commit, like Engine.update
    assert isys.is_down(ord("D"))


def test_present_emits_half_block_frame():
    out = io.StringIO()
    be = _backend(out)
    be.term_size = lambda: (20, 11)            # 20 cols, 10 usable lines
    img = np.zeros((40, 80, 3), np.uint8)
    img[:20] = [255, 0, 0]                     # top half red
    img[20:] = [0, 0, 255]                     # bottom half blue
    frame = be.present(img)
    assert frame.startswith("\x1b[H")
    assert frame.count("▀") == 20 * 10         # cols x (lines-1) cells
    assert "\x1b[38;2;255;0;0m" in frame       # red foreground (upper px)
    assert "\x1b[48;2;0;0;255m" in frame       # blue background (lower px)
    assert out.getvalue() == frame             # written + flushed


def test_enter_exit_safe_without_tty():
    out = io.StringIO()
    be = TerminalWindowBackend(out=out)
    with be:
        pass
    s = out.getvalue()
    assert "\x1b[?1049h" in s and "\x1b[?1049l" in s   # alt screen on/off
