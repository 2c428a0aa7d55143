from nutils_tpu import mesh, function, export, testing
from nutils_tpu.solver import System

# Poisson's equation on a unit square, demonstrating direct function
# manipulation without namespace expressions (reference: examples/poisson.py;
# regression data copied verbatim for bit-level parity).


def main(nelems: int = 32):
    '''Poisson's equation on a unit square

    Solves Poisson's equation `Δu = 1` subject to zero boundary constraints,
    using the fact that the solution to the strong form minimizes the
    functional `∫ .5 ‖∇u‖² - u`.

    Parameters
    ----------
    nelems
        Number of elements along edge.
    '''

    topo, x = mesh.unitsquare(nelems, etype='square')
    u = topo.field('u', btype='std', degree=1)
    g = u.grad(x)
    J = function.J(x)

    sqr = topo.boundary.integral(u**2 * J, degree=2)
    cons = System(sqr, trial='u').solve_constraints(droptol=1e-12)

    energy = topo.integral((g @ g / 2 - u) * J, degree=1)
    args = System(energy, trial='u').solve(constrain=cons)

    bezier = topo.sample('bezier', 3)
    x, u = bezier.eval([x, u], args)
    export.triplot('u.png', x, u, tri=bezier.tri, cmap='jet')

    return args


class test(testing.TestCase):

    def test_simple(self):
        args = main(nelems=10)
        self.assertAlmostEqual64(args['u'], '''
            eNp9zrENwCAMBEBGYQJ444o2ozAAYgFmYhLEFqxAmye1FUtf+PSy7Jw9J6yoKGiMYsUTrq44kaVKZ7JM
            +lWlDdlymEFXXC2o3H1C8mmzXz5t6OwhPfTDO+2na9+1f7D/teYFdsk5vQ==''')


if __name__ == '__main__':
    from nutils_tpu import cli
    cli.run(main)
