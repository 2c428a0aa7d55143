'''Host-side setup kernels (quadrature, splines) and device kernels (pallas).'''
