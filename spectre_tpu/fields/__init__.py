from .params import (
    BN254_FR, BN254_FQ, BLS12_381_FQ, BLS12_381_FR,
)
from .limb import FieldSpec, fr_spec, fq_spec, bls_fq_spec
