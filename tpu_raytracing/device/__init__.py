from .scene_buffers import DeviceScene, SceneMeta, compile_scene

__all__ = ["DeviceScene", "SceneMeta", "compile_scene"]
