from . import lie, quaternion, projective, pointmap  # noqa: F401
