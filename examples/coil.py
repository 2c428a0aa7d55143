from nutils_tpu import export, function, mesh, testing
from nutils_tpu.solver import System
from nutils_tpu.expression import Namespace
from nutils_tpu.utils import _log as treelog
import functools
import numpy

# Current-induced magnetic field of a toroidal coil: axisymmetric quasi-static
# magnetic vector potential with complex phasor unknowns, solved on the
# tensor product of a trimmed RZ quarter-plane and a revolution space
# (reference: examples/coil.py; regression data copied verbatim for parity).


def main(nelems: int = 50,
         degree: int = 3,
         freq: float = 0.,
         rwire: float = .0025,
         rcoil: float = 0.025,
         nturns: int = 1):

    '''Current-induced magnetic field

    Computes the magnetic field induced by a DC or AC current in one or
    several toroidal conductors, via the quasi-static magnetic vector
    potential with Lorenz gauge:

        ∇_j(∇_j(A_i)) = -μ0 J_i

    where the current density J is the sum of the external current Jext
    (uniform over the wire cross section) and the induced current
    Jind_i = -σ ∂_t(A_i).  For time-harmonic drive the temporal component is
    eliminated by the phasor substitution A_i = Re(Â_i exp(j ω t)), turning
    the problem complex-valued:

        ∇_j(∇_j(Â_i)) = -μ0 Ĵ_i,  Ĵind_i = -j ω σ Â_i

    Parameters
    ----------
    nelems
        Number of elements per spatial dimension.
    degree
        Polynomial degree of the discretized magnetic vector potential.
    freq
        Alternating current frequency; 0 selects direct current.
    rwire
        Radius of the wire.
    rcoil
        Radius of the coil (must exceed rwire).
    nturns
        Number of windings, spaced by 4 rwire.
    '''

    ns = Namespace()
    ns.j = 1j
    ns.π = numpy.pi
    ns.f = freq
    ns.ω = '2 π f'
    ns.μ0 = '4e-7 π'  # magnetic permeability in vacuum
    ns.σ = 5.988e7  # conductivity of copper
    ns.rcoil = rcoil
    ns.rwire = rwire

    # The problem is axisymmetric in the z-axis and symmetric in z=0: a 2D RZ
    # domain covering the quarter plane [0,inf)^2 (mapped from [0,1] by an
    # arctanh stretch) is multiplied with a one-element revolution domain, and
    # the geometry and vector bases are transformed from cylindrical to
    # cartesian coordinates.  A natural boundary condition at z=0 gives the
    # symmetry.

    RZ, ns.rz0 = mesh.rectilinear([numpy.linspace(0, 1, nelems)] * 2, space='RZ')
    REV, ns.θ = mesh.line([-numpy.pi, numpy.pi], bnames=['start', 'end'], space='Θ')
    REV0 = REV.refined[:1].boundary['end'].sample('bezier', 2)
    ns.rz = numpy.arctanh(ns.rz0) * 2 * rcoil
    ns.r, ns.z = ns.rz

    # Trim the wire cross sections, centered at (rcoil, zwires).

    ns.zwires = (numpy.arange(nturns) - (nturns - 1) / 2) * 4 * rwire
    ns.dwires = ns.rwire - numpy.sqrt((ns.r - ns.rcoil)**2 + functools.reduce(numpy.minimum, (ns.z - ns.zwires)**2))
    RZ = RZ.withsubdomain(coil=RZ[:-1, :-1].trim(ns.dwires / ns.rwire, maxrefine=4))

    ns.rot = numpy.stack([function.scatter(function.trignormal(ns.θ), 3, [0, 1]), function.kronecker(1., 0, 3, 2)])
    ns.eθ = numpy.stack(['-sin(θ)', 'cos(θ)', '0'] @ ns)

    X = RZ * REV
    ns.x = ns.rz @ ns.rot
    ns.define_for('x', gradient='∇', jacobians=('dV', 'dS'), curl='curl')
    ns.A = RZ.field('A', btype='spline', degree=degree, removedofs=[[0, -1], [-1]], dtype=complex) * ns.eθ
    ns.Atest = function.replace_arguments(ns.A, 'A:Atest')
    ns.B_i = 'curl_ij(A_j)'
    ns.E_i = '-j ω A_i'
    ns.Jind_i = 'σ E_i'
    ns.I = 1
    ns.Jext_i = 'eθ_i I / π rwire^2'
    ns.J_i = 'Jext_i + Jind_i'

    res = REV.integral(RZ.integral('-∇_j(Atest_i) ∇_j(A_i) dV' @ ns, degree=2 * degree), degree=0)
    res += REV.integral(RZ['coil'].integral('μ0 Atest_i J_i dV' @ ns, degree=2 * degree), degree=0)

    args = System(res, trial='A', test='Atest').solve()

    # The coordinate transformation is singular at r=0, so B (the curl of A)
    # is projected onto a basis rather than evaluated directly.

    ns.Borig = ns.B
    ns.B = function.field('B', RZ.basis('spline', degree=degree), ns.rot, dtype=complex)
    ns.Btest = function.replace_arguments(ns.B, 'B:Btest')
    res = REV.integral(RZ.integral('Btest_i (B_i - Borig_i) dV' @ ns, degree=2 * degree), degree=0)
    args = System(res, trial='B', test='Btest').solve(arguments=args)

    with export.mplfigure('magnetic-potential-1.png', dpi=300) as fig:
        ax = fig.add_subplot(111, aspect='equal', xlabel='$x_0$', ylabel='$x_2$', adjustable='datalim')
        # magnetic vector potential and flux magnitude: r < 0 shows the
        # imaginary part, r > 0 the real part
        smpl = REV0 * RZ[:-1, :-1].sample('bezier', 5)
        r, z, A, Bmag = smpl.eval(['r', 'z', 'A_1', 'sqrt(real(B_i) real(B_i)) + sqrt(imag(B_i) imag(B_i)) j'] @ ns, args)
        Amax = numpy.abs(A).max()
        Bmax = numpy.abs(Bmag).max()
        levels = numpy.linspace(-Amax, Amax, 32)[1:-1]
        r2 = numpy.concatenate([r, r], axis=0)
        z2 = numpy.concatenate([z, -z], axis=0)
        A2 = numpy.concatenate([A, A], axis=0)
        B2 = numpy.concatenate([Bmag, Bmag], axis=0)
        tri = numpy.concatenate([smpl.tri + i * smpl.npoints for i in range(2)])
        imBi = ax.tripcolor(-r2, z2, tri, B2.imag, shading='gouraud', cmap='Greens')
        imBi.set_clim(0, Bmax)
        ax.tricontour(-r2, z2, tri, -A2.imag, colors='k', linewidths=.5, levels=levels)
        imBr = ax.tripcolor(r2, z2, tri, B2.real, shading='gouraud', cmap='Greens')
        imBr.set_clim(0, Bmax)
        ax.tricontour(r2, z2, tri, A2.real, colors='k', linewidths=.5, levels=levels)
        ax.axvline(0, color='k')
        ax.set_xlim(-2 * rcoil, 2 * rcoil)
        ax.set_ylim(-2 * rcoil, 2 * rcoil)
        fig.colorbar(imBr, label='$|B|$')

    if freq == 0:
        ns.δ = function.eye(3)
        # Reference solution: https://physics.stackexchange.com/a/355183
        ns.Bexact = ns.δ[2] * ns.μ0 * ns.I * ns.rcoil**2 / 2 * ((ns.rcoil**2 + (ns.z - ns.zwires)**2)**(-3 / 2)).sum()
        smpl = REV0 * RZ[:-1, :-1].boundary['left'].sample('bezier', 5)
        B, Bexact, z = smpl.eval(['real(B_2)', 'Bexact_2', 'z'] @ ns, args)
        z = numpy.concatenate([-z[::-1], z])
        B = numpy.concatenate([B[::-1], B])
        Bexact = numpy.concatenate([Bexact[::-1], Bexact])
        with export.mplfigure('magnetic-field-x2-axis.png', dpi=300) as fig:
            ax = fig.add_subplot(111, xlabel='$x_2$', ylabel='$B_2$', title='$B_2$ at $x_0 = x_1 = 0$')
            ax.plot(z, B, label='FEM')
            ax.plot(z, Bexact, label='exact', linestyle='dotted')
            ax.legend()

    return args


class test(testing.TestCase):

    def test_dc(self):
        args = main(nelems=16, degree=2)
        with self.subTest('A.real'):
            self.assertAlmostEqual64(args['A'].real, '''
                eNoNke9rzWEYh5NzVmtnvud5nvv+3PdzTn7lIIRlL3Rq/wArinFGaytFo6xjTedISMwsJsNksbJYtlIS
                U9pqLcqJKL9ytL3xYm92kpkQ2vL9B67P9el6TS/oHuVpPb13zW7WZu2U2WaG4t8CF8xWVsS+YgZF3MYu
                /OYLTHyFyijrXllrNxvEqxaVa1S/yJBk5CfaEUMnz1MzPXcxV23JVAWjOq4D2qAL9YakZBAp9HKE99F9
                99E+NcWgw5/yaT+tJzWm3WLlEiI4wu9oKdW6TTYTL/m//oPf4T9rvU7IXvmE7RjjFB+lAXfZjsRrk2uT
                qxM3fcSfDTfaJSqn8YubeJhKbtIG5kdiImESHX5ez2iFXpWk9MHjPE/Rckq4jDnhO/0xv8SPhfwZOScq
                d7EG/VzGW0ODHvNdS+GDa7pTy/WJNMgcrmMlBln4ALW6l2aZrtCk/pO3cksaRaSALCrRx8pt1OX+mLzk
                5JDUS01ILmEYOWzEJB/nKGep1y22j/AYD3AH3chjD6oRxRu+yDVcpN3U49K2wAV+xqP8kPu5i9u4jjfw
                HI1Ta9ihya2zLdRCh+kg7adGqqMtlKZVFKNpN+JyboFL2f8Z6oV2''')

    def test_ac_5(self):
        args = main(nelems=16, degree=2, freq=1000., nturns=5)
        with self.subTest('A.imag'):
            self.assertAlmostEqual64(args['A'].imag, '''
                eNoNkEtIlGEYhRcWBqVWNgsxujBImxJmIIwEc2FJCYVaQxEErRIvkyFOhqTB4CLSpE3TxQiLCjXQEdJN
                QUkZKMxCyxYhmpvvPe/7ft//K11AvPSvzuJZnPOcOZ3TeV1SX3PtERu3n2zEfXRNXqkfXU6s9P5O8wiP
                8nue5kXeLhXyRHL0mVbZApfn1fj1K4MYwgjeYQLzWEcZpzhPXkqtHrAhF/Pqlzdpg9YpG/kIowb3wGjg
                rTImSU3YUTfhN9MNaqcEdVIfDdIaNeAPUnxGQpplS12Fn0+7KItCVBhkLSVpC17jNG/wFxnWRbvgtZmk
                +WxumQ4zY6rNX/ODmrGfp7hH4vrIdnuPzQuTMU9Nv/lpeswe+h407Aic6qRcr9iT3jE6SoepjE5RJXXR
                MOXiPkI8xBfkoEbtNu859dNAsGycvhFRGHFM4Xjwx3nZqbvtrCtCEQ4hivLALoE+zGIvt/IvvhbwTX3j
                0khjDB8wjQX8QyFXcidP8j7plbCuaZeLcYwv8VVu5HZ+wG85w6sckZsyI+c0xza6YimWiJTICamSy3Jd
                7spAwLL1rKa12t5xLdqirdqmtzWp3ZrSVzquGXVaYC/ar/ah+w/zsU82''')


if __name__ == '__main__':
    from nutils_tpu import cli
    cli.run(main)


# example:tags=electro-magnetism:thumbnail=0
