from .bls12 import Bls12  # noqa: F401
from .bn import Bn  # noqa: F401
from .bw6 import BW6  # noqa: F401
from .mnt import MNT4, MNT6, MNTEngine  # noqa: F401
