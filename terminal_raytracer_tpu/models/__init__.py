"""Scene data model (JSON schema -> SoA / static constants) and fly camera."""

from .camera import Camera  # noqa: F401
from .scene import Scene, list_scenes, load_scene, scene_from_dict  # noqa: F401
