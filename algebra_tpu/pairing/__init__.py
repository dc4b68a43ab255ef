from .bls12 import Bls12  # noqa: F401
from .bn import Bn  # noqa: F401
