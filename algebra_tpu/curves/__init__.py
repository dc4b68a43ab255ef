from .sw import SWCurve  # noqa: F401
from .te import TECurve  # noqa: F401
