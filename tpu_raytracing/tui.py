"""Interactive terminal settings form (parity: crates/cli/src/tui.rs).

A curses form over the same CLI argument set: arrow keys move between
fields, left/right cycle enum values (scene, backend, sampler, output
format), digits edit numeric fields, Enter starts the render, q/Esc
cancels. Returns the edited argparse namespace, or None on cancel —
mirroring tui::run()'s Option<CommandLineArguments>.
"""
from __future__ import annotations

import curses
from dataclasses import dataclass
from typing import Callable, List, Optional


@dataclass
class _Field:
    label: str
    get: Callable[[], str]
    cycle: Optional[Callable[[int], None]] = None   # left/right handler
    edit: Optional[Callable[[str], None]] = None    # text-entry handler


def _cycle_list(values, current, d):
    if current not in values:
        return values[0]
    return values[(values.index(current) + d) % len(values)]


def run(args):
    """Run the form; returns edited args or None if cancelled."""
    from .scene.test_scenes import all_test_scenes

    scene_names = [s.name for s in all_test_scenes()]
    state = {
        "scene": args.scene_name or scene_names[0],
        "backend": args.backend,
        "sampler": args.sampler or "independent",
        "spp": str(args.spp or 32),
        "depth": str(args.ray_depth or 8),
        "lights": str(args.light_samples or 4),
        "output": str(args.output or "output.exr"),
    }

    def num_edit(key):
        def apply(ch):
            if ch == "\x7f":
                state[key] = state[key][:-1]
            elif ch.isdigit():
                state[key] += ch
        return apply

    fields: List[_Field] = [
        _Field("Scene", lambda: state["scene"],
               cycle=lambda d: state.update(scene=_cycle_list(scene_names, state["scene"], d))),
        _Field("Backend", lambda: state["backend"],
               cycle=lambda d: state.update(backend=_cycle_list(["jax", "cpu", "tpu"], state["backend"], d))),
        _Field("Sampler", lambda: state["sampler"],
               cycle=lambda d: state.update(sampler=_cycle_list(["independent", "stratified"], state["sampler"], d))),
        _Field("Samples per pixel", lambda: state["spp"], edit=num_edit("spp")),
        _Field("Ray depth", lambda: state["depth"], edit=num_edit("depth")),
        _Field("Light samples", lambda: state["lights"], edit=num_edit("lights")),
        _Field("Output file", lambda: state["output"],
               edit=lambda ch: state.update(
                   output=state["output"][:-1] if ch == "\x7f" else state["output"] + ch
               )),
    ]

    result = _run_form(fields)
    if not result:
        return None

    args.scene_name = state["scene"]
    args.scene_path = None
    args.backend = state["backend"]
    args.sampler = state["sampler"]
    args.spp = int(state["spp"] or 32)
    args.ray_depth = int(state["depth"] or 8)
    args.light_samples = int(state["lights"] or 4)
    from pathlib import Path

    args.output = Path(state["output"] or "output.exr")
    args.interactive = False
    return args


def _run_form(fields: List[_Field]) -> bool:
    def inner(stdscr) -> bool:
        curses.curs_set(0)
        sel = 0
        while True:
            stdscr.erase()
            stdscr.addstr(0, 2, "tpu-raytracing — render settings", curses.A_BOLD)
            stdscr.addstr(1, 2, "↑/↓ select · ←/→ cycle · type to edit · Enter render · q cancel")
            for i, f in enumerate(fields):
                attr = curses.A_REVERSE if i == sel else curses.A_NORMAL
                stdscr.addstr(3 + i, 4, f"{f.label:<20} {f.get():<30}", attr)
            stdscr.refresh()
            ch = stdscr.getch()
            if ch in (ord("q"), 27):
                return False
            if ch in (curses.KEY_ENTER, 10, 13):
                return True
            if ch == curses.KEY_UP:
                sel = (sel - 1) % len(fields)
            elif ch == curses.KEY_DOWN:
                sel = (sel + 1) % len(fields)
            elif ch in (curses.KEY_LEFT, curses.KEY_RIGHT):
                if fields[sel].cycle:
                    fields[sel].cycle(1 if ch == curses.KEY_RIGHT else -1)
            elif 0 < ch < 256 and fields[sel].edit:
                fields[sel].edit(chr(ch))

    return curses.wrapper(inner)
