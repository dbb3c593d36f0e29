"""Live SLAM viewer (browser-based).

TPU-native replacement for the reference's Open3D GUI
(/root/reference/hislam2/gaussian/gui/slam_gui.py, gui_utils.py): instead
of an in-process OpenGL window fed by a multiprocessing queue, a tiny
zero-dependency HTTP server exposes the live SLAM state (Gaussian arena,
keyframe trajectory, loop edges, keyframe images) and a WebGL2 page
renders it in any browser. Pull-based: device->host transfers happen only
when a client asks, so an attached viewer costs nothing on the hot path
when idle and a headless run pays zero overhead.
"""
from .server import ViewerServer

__all__ = ["ViewerServer"]
