from nutils_tpu import mesh, function, export, testing
from nutils_tpu.solver import System
from nutils_tpu.expression import Namespace
from nutils_tpu.utils import _log as treelog

# Laplace problem on a unit square with all combinations of homogeneous and
# heterogeneous, Dirichlet and Neumann boundary conditions, with exact
# solution uexact = sin(x) cosh(y) (reference: examples/laplace.py; regression
# data copied verbatim for bit-level parity).


def main(nelems: int = 10,
         etype: str = 'square',
         btype: str = 'std',
         degree: int = 1):

    '''Laplace problem on a unit square

    Solves Laplace's equation `Δu = 0` on a unit square domain `Ω` with
    boundary `Γ`, subject to boundary conditions:

            u = 0                 Γ_left
        ∂_n u = 0                 Γ_bottom
        ∂_n u = cos(1) cosh(y)    Γ_right
            u = cosh(1) sin(x)    Γ_top

    Parameters
    ----------
    nelems
        Number of elements along edge.
    etype
        Type of elements (square/triangle/mixed).
    btype
        Type of basis function (std/spline), availability depending on the
        selected element type.
    degree
        Polynomial degree.
    '''

    domain, geom = mesh.unitsquare(nelems, etype)

    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='∇', normal='n', jacobians=('dV', 'dS'))
    ns.u = domain.field('u', btype=btype, degree=degree)
    ns.v = domain.field('v', btype=btype, degree=degree)

    # In weak form: find u such that ∫_Ω ∇v·∇u - ∫_Γn v f = 0 for all v.

    res = domain.integral('∇_i(v) ∇_i(u) dV' @ ns, degree=degree*2)
    res -= domain.boundary['right'].integral('v cos(1) cosh(x_1) dS' @ ns, degree=degree*2)

    # Dirichlet constraints minimize ∫_Γd (u - u_d)^2.

    sqr = domain.boundary['left'].integral('u^2 dS' @ ns, degree=degree*2)
    sqr += domain.boundary['top'].integral('(u - cosh(1) sin(x_0))^2 dS' @ ns, degree=degree*2)
    cons = System(sqr, trial='u').solve_constraints(droptol=1e-15)

    args = System(res, trial='u', test='v').solve(constrain=cons)

    bezier = domain.sample('bezier', 9)
    xsmp, usmp = bezier.eval(['x_i', 'u'] @ ns, args)
    export.triplot('solution.png', xsmp, usmp, tri=bezier.tri, hull=bezier.hull)

    err = domain.integral('(u - sin(x_0) cosh(x_1))^2 dV' @ ns, degree=degree*2).eval(args)**.5
    treelog.user('L2 error: {:.2e}'.format(err))

    return cons['u'], args['u'], err


class test(testing.TestCase):

    def test_simple(self):
        cons, u, err = main(nelems=4)
        with self.subTest('constraints'):
            self.assertAlmostEqual64(cons, '''
                eNrbKPv1QZ3ip9sL1BgaILDYFMbaZwZj5ZnDWNfNAeWPESU=''')
        with self.subTest('left-hand side'):
            self.assertAlmostEqual64(u, '''
                eNoBMgDN/7Ed9eB+IfLboCaXNKc01DQaNXM14jXyNR82ZTa+NpI2oTbPNhU3bjf7Ngo3ODd+N9c3SNEU
                1g==''')
        with self.subTest('L2-error'):
            self.assertAlmostEqual(err, 1.63e-3, places=5)

    def test_mixed(self):
        cons, u, err = main(nelems=4, etype='mixed', degree=2)
        with self.subTest('constraints'):
            self.assertAlmostEqual64(cons, '''
                eNorfLZF2ucJQwMC3pR7+QDG9lCquAtj71Rlu8XQIGfC0FBoiqweE1qaMTTsNsOvRtmcoSHbHL+a1UD5
                q+YAxhcu1g==''')
        with self.subTest('left-hand side'):
            self.assertAlmostEqual64(u, '''
                eNorfLZF2ueJq7GrcYjxDJPpJstNbsq9fOBr3Gh8xWS7iYdSxd19xseMP5hImu5UZbv1xljOxM600DTW
                NN/0k2mC6SPTx6Z1pnNMGc3kzdaaPjRNMbMyEzWzNOsy223mBYRRZpPNJpktMks1azM7Z7bRbIXZabNX
                ZiLmH82UzS3Ns80vmj004za/ZPYHCD+Y8ZlLmVuYq5kHm9eahwDxavPF5lfNAWFyPdk=''')
        with self.subTest('L2-error'):
            self.assertAlmostEqual(err, 1.25e-4, places=6)

    def test_spline(self):
        cons, u, err = main(nelems=4, btype='spline', degree=2)
        with self.subTest('constraints'):
            self.assertAlmostEqual64(cons, '''
                eNqrkmN+sEfhzF0xleRbDA0wKGeCYFuaIdjK5gj2aiT2VXMAJB0VAQ==''')
        with self.subTest('left-hand side'):
            self.assertAlmostEqual64(u, '''
                eNqrkmN+sEfhzF0xleRbrsauxsnGc43fGMuZJJgmmNaZ7jBlN7M08wLCDLNFZh/NlM0vmV0y+2CmZV5p
                vtr8j9kfMynzEPPF5lfNAcuhGvs=''')
        with self.subTest('L2-error'):
            self.assertAlmostEqual(err, 8.04e-5, places=7)


if __name__ == '__main__':
    from nutils_tpu import cli
    cli.run(main)
