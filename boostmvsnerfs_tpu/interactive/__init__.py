"""Interactive viewer: browser-served live rendering (L7).

The reference ships a GLFW/imgui OpenGL viewer
(``/root/reference/lib/interactive/``, ``lib/visualizers/enerf_interactive.py``)
that renders on a local GPU into a native window. On a TPU host there is no
local display or GL stack, so the equivalent here is a small HTTP server
(``server.py``) that renders frames on the accelerator and streams JPEGs to
a browser page with the same camera interactions (drag-rotate, pan, zoom,
WASD, camera-path autoplay) and render options (level / pred vs depth).
"""

from boostmvsnerfs_tpu.interactive.camera import (  # noqa: F401
    InteractiveCamera,
    RenderOptions,
)
