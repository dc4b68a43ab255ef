from .expander import expand_message_xmd, expand_message_xof  # noqa: F401
from .hash_to_field import hash_to_field  # noqa: F401
from .map_to_curve import MapToCurveHasher, SWUMap, WBMap  # noqa: F401
