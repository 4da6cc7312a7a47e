from .domain import Domain
from .ntt import ntt, intt
