"""Command-line frontend (reference: all-is-cubes-desktop CLI).

Mirrors the reference binary's graphics modes (desktop/src/bin/
all-is-cubes/main.rs:40-222) that make sense headless-first on a TPU host:

  print      one-shot raytrace to colored terminal text (terminal.rs -print)
  record     render frames to PNG (record.rs)
  headless   step the universe without rendering
  terminal   interactive ASCII session (simplified ratatui mode)

Usage: python -m aic_tpu.main --template cornell-box --graphics print
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_template(name: str, seed: int = 0, size: int | None = None):
    from .content import TemplateParameters, build_template_space

    try:
        return build_template_space(name, TemplateParameters(seed=seed, size=size))
    except KeyError:
        from .content import TEMPLATE_NAMES

        raise SystemExit(
            f"unknown template {name!r}; available: {', '.join(TEMPLATE_NAMES)}"
        )


def _ensure_player(u):
    """Guarantee a 'player' character for session modes on a loaded
    universe document (the desktop's get-or-create character on open)."""
    if "player" in u.characters:
        return
    sname = next(iter(u.spaces))
    sp = u.spaces[sname]
    spawn = (
        tuple(float(x) for x in sp.spawn_position)
        if sp.spawn_position is not None
        else tuple(
            lo + sz / 2.0 for lo, sz in zip(sp.bounds.lower, sp.bounds.size)
        )
    )
    u.insert_character("player", sname, spawn)


def default_camera(space, width, height, options):
    from .raytrace import Camera, Viewport

    cam = Camera(options, Viewport(width, height))
    lo = np.asarray(space.bounds.lower, float)
    hi = np.asarray(space.bounds.upper, float)
    center = (lo + hi) / 2
    if space.spawn_position is not None:
        eye = np.asarray(space.spawn_position, float)
    else:
        eye = center + (hi - lo) * np.array([0.4, 0.35, 1.1])
    cam.look_at(eye, center)
    return cam


def ansi_image(data: np.ndarray) -> str:
    """sRGB image → 24-bit-color half-block terminal art (terminal.rs
    ray_image analog)."""
    h = data.shape[0] // 2 * 2
    rows = []
    for y in range(0, h, 2):
        row = []
        for x in range(data.shape[1]):
            top = data[y, x]
            bot = data[y + 1, x]
            row.append(
                f"\x1b[38;2;{top[0]};{top[1]};{top[2]}m"
                f"\x1b[48;2;{bot[0]};{bot[1]};{bot[2]}m▀"
            )
        rows.append("".join(row) + "\x1b[0m")
    return "\n".join(rows)


def main(argv=None):
    p = argparse.ArgumentParser(prog="aic-tpu")
    p.add_argument(
        "input",
        nargs="?",
        default=None,
        metavar="UNIVERSE_FILE",
        help="universe file to open (.json native, .alliscubesjson, "
        ".vox); the session saves back to it (whence.rs provenance). "
        "When omitted, --template builds a fresh universe.",
    )
    p.add_argument("--template", default="cornell-box")
    p.add_argument(
        "--graphics",
        default="print",
        choices=["print", "record", "headless", "terminal", "window", "serve"],
    )
    p.add_argument("--port", type=int, default=8080, help="serve mode port")
    p.add_argument("--size", type=int, default=None, help="template size")
    p.add_argument("--width", type=int, default=120)
    p.add_argument("--height", type=int, default=80)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="frame.png")
    p.add_argument("--frames", type=int, default=1)
    p.add_argument(
        "--camera-script",
        default=None,
        metavar="FILE.json",
        help="record mode: keyframed camera path (record/script.rs JSON: "
        '{"position": {"times": [...], "values": [[x,y,z], ...]}, '
        '"look_direction": {...}})',
    )
    p.add_argument("--duration", type=float, default=1.0, help="headless sim seconds")
    p.add_argument("--lighting", default="smoothstep")
    p.add_argument("--no-relight", action="store_true")
    # Logging/telemetry (logging.rs LoggingArgs: --verbose,
    # --simplify-log-format, rerun stream → --telemetry JSONL).
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--simplify-log-format", action="store_true")
    p.add_argument("--telemetry", default=None, metavar="FILE.jsonl")
    args = p.parse_args(argv)

    from . import logging as aic_logging
    from .light import evaluate_light
    from .raytrace import GraphicsOptions, render, save_png

    aic_logging.install(
        verbose=args.verbose, simplify_log_format=args.simplify_log_format
    )
    log = aic_logging.get_logger("aic_tpu.main")
    telemetry = aic_logging.Telemetry(args.telemetry) if args.telemetry else None

    loaded_universe = None
    if args.input:
        # Open a universe document; `whence` points back at it so the
        # session's save writes to the origin (save/whence.rs:20).
        from .io.whence import load_universe_file

        loaded_universe = load_universe_file(args.input)
        wname = (
            "world"
            if "world" in loaded_universe.spaces
            else next(iter(loaded_universe.spaces))
        )
        space = loaded_universe.spaces[wname]
        log_src = loaded_universe.whence.document_name()
        print(f"[open] {log_src}", file=sys.stderr)
    else:
        space = build_template(args.template, args.seed, args.size)
    state = space.snapshot()
    if not args.no_relight and state.light_enabled:
        t0 = time.time()
        state, n = evaluate_light(state, batch_size=1024, max_rounds=5000)
        print(f"[light] {n} cube updates in {time.time()-t0:.1f}s", file=sys.stderr)

    options = GraphicsOptions(lighting_display=args.lighting, fog="none")

    if args.graphics == "headless":
        from .universe import Universe

        if loaded_universe is not None:
            u = loaded_universe
        else:
            u = Universe()
            u.insert_space("world", space)
            u.states["world"] = state
        if telemetry is not None:
            telemetry.attach_to_universe(u)
        n_ticks = int(args.duration * 60)
        t0 = time.time()
        with aic_logging.ProgressBar(n_ticks, "step") as bar:
            for _ in range(n_ticks):
                info = u.step()
                bar.advance()
        log.info("[headless] %d ticks in %.1fs", info.tick + 1, time.time() - t0)
        if telemetry is not None:
            telemetry.close()
        return

    cam = default_camera(space, args.width, args.height, options)
    t0 = time.time()
    r = render(state, cam)
    print(f"[render] {args.width}x{args.height} in {time.time()-t0:.1f}s", file=sys.stderr)

    if args.graphics == "print":
        print(ansi_image(r.data))
    elif args.graphics == "record" and not args.output.endswith(".png"):
        # Non-image outputs: export the scene itself (the reference's
        # `--output` export dispatch, all-is-cubes-desktop/src/record.rs +
        # port/src/lib.rs ExportFormat). glTF goes through the textured
        # mesh path; --frames N animates stepped snapshots.
        from .io import export_gltf, export_gltf_animation, export_stl, save_universe
        from .io.vox import export_vox
        from .mesh import mesh_space_textured, mesh_space_voxel_detail
        from .universe import Universe

        out = args.output
        if out.endswith(".gltf"):
            if args.frames > 1:
                u = Universe()
                u.insert_space("world", space)
                u.states["world"] = state
                frames = []
                for _ in range(args.frames):
                    frames.append(mesh_space_textured(space))
                    u.step()
                export_gltf_animation(frames, out)
            else:
                export_gltf(mesh_space_textured(space), out)
        elif out.endswith(".stl"):
            export_stl(mesh_space_voxel_detail(space), out)
        elif out.endswith(".vox"):
            export_vox(space, out)
        else:
            u = Universe()
            u.insert_space("world", space)
            u.states["world"] = state
            save_universe(u, out)
        print(f"wrote {out}", file=sys.stderr)
    elif args.graphics == "record":
        if args.frames == 1:
            save_png(r, args.output)
            print(f"wrote {args.output}", file=sys.stderr)
        else:
            # Animated record (record.rs + record/script.rs): fixed-clock
            # universe stepping with an orbiting camera script, written as
            # APNG (or GIF if the output says so).
            from .universe import Universe

            u = Universe()
            u.insert_space("world", space)
            u.states["world"] = state
            c = [l + s_ / 2.0 for l, s_ in zip(space.bounds.lower, space.bounds.size)]
            radius = max(space.bounds.size) * 0.9
            script = None
            if args.camera_script:
                from .apps.record_script import CameraScript

                script = CameraScript.from_file(args.camera_script)
            frames = []
            for i in range(args.frames):
                ang = 2.0 * np.pi * i / args.frames
                eye = (
                    c[0] + radius * np.cos(ang),
                    c[1] + space.bounds.size[1] * 0.4,
                    c[2] + radius * np.sin(ang),
                )
                if script is not None:
                    # Scripted flight (record/script.rs); time advances
                    # on the record clock (30 fps output frames).
                    script.camera_at(i / 30.0, cam, eye, c)
                else:
                    cam.look_at(eye, c)
                fr = render(u.states["world"], cam)
                frames.append(fr.data)
                u.step()
            from PIL import Image

            imgs = [Image.fromarray(f, "RGBA") for f in frames]
            imgs[0].save(
                args.output,
                save_all=True,
                append_images=imgs[1:],
                duration=1000 // 30,
                loop=0,
            )
            print(f"wrote {args.output} ({args.frames} frames)", file=sys.stderr)
    elif args.graphics == "serve":
        from .apps.server import SessionServer
        from .apps.session import Session
        from .raytrace import Viewport
        from .universe import Universe

        if loaded_universe is not None:
            u = loaded_universe
            _ensure_player(u)
        else:
            u = Universe()
            u.insert_space("world", space)
            u.states["world"] = state
            spawn = (
                tuple(float(x) for x in space.spawn_position)
                if space.spawn_position is not None
                else tuple(l + s_ / 2.0 for l, s_ in zip(space.bounds.lower, space.bounds.size))
            )
            u.insert_character("player", "world", spawn)
        session = Session(u, viewport=Viewport(args.width, args.height), options=options)
        session.enable_ui()
        srv = SessionServer(session, port=args.port)
        print(f"serving on http://127.0.0.1:{srv.port}/", file=sys.stderr)
        srv.serve_forever()
    elif args.graphics == "window":
        from .apps.window import run_window_session

        if loaded_universe is not None:
            _ensure_player(loaded_universe)
        run_window_session(
            space,
            state,
            width=args.width,
            height=args.height,
            options=options,
            universe=loaded_universe,
        )
    elif args.graphics == "terminal":
        if not sys.stdin.isatty():
            # One-shot fallback (terminal.rs -print behavior) for pipes.
            print(ansi_image(r.data))
            return
        from .apps.terminal import run_terminal_session

        run_terminal_session(
            space, state, width=args.width, height=args.height, options=options
        )


if __name__ == "__main__":
    main()
