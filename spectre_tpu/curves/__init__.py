from .host import CurveHost, bn254_g1, bls_g1, bls_g2_host
