'''SI unit system and export (triplot/vtk) suites (reference scope models:
tests/test_SI.py, tests/test_export.py).'''

import os

import numpy
import pytest

from nutils_tpu import SI, export, function, mesh


# ----------------------------------------------------------------- SI

def test_dimension_algebra():
    L = SI.Length
    T = SI.Time
    V = L / T
    assert V is SI.Velocity
    assert (V * T) is L
    assert (L ** 2) is SI.Area
    with pytest.raises(SI.DimensionError):
        SI.parse('2m') + SI.parse('3s')


def test_parse_and_format():
    x = SI.parse('5cm')
    assert isinstance(x, SI.Length)
    assert float(x / SI.parse('1m')) == pytest.approx(0.05)
    rho = SI.parse('1000kg/m3')
    g = SI.parse('9.81m/s2')
    h = SI.parse('2m')
    p = rho * g * h
    assert isinstance(p, SI.Pressure)
    assert float(p / SI.parse('1Pa')) == pytest.approx(19620.0)


def test_quantity_numpy_ufuncs():
    a = SI.parse('1m') * numpy.array([1.0, 2.0])
    b = SI.parse('1m') * numpy.array([3.0, 4.0])
    s = a + b
    assert isinstance(s, SI.Length)
    numpy.testing.assert_allclose(SI._val_of(s), [4.0, 6.0])
    sq = a * a
    assert isinstance(sq, SI.Area)
    with pytest.raises(SI.DimensionError):
        a + SI.parse('1s')


def test_quantity_function_arrays():
    topo, geom0 = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    geom = geom0 * SI.parse('2m')
    J = function.J(geom)
    area = topo.sample('gauss', 2).integrate(J, {})
    assert isinstance(area, SI.Area)
    assert float(area / SI.parse('1m2')) == pytest.approx(4.0, rel=1e-12)
    g = function.grad(geom0[0] * SI.parse('3N'), geom)
    smp = topo.sample('gauss', 1)
    vals = smp.eval(g, {})
    # N / m
    assert SI._dim_of(vals) is (SI.Force / SI.Length)


# ----------------------------------------------------------------- export

@pytest.fixture()
def sampled(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    topo, geom = mesh.unitsquare(3, 'triangle')
    bez = topo.sample('bezier', 3)
    x, u = (numpy.asarray(a) for a in bez.eval([geom, (geom ** 2).sum(-1)], {}))
    return bez, x, u, tmp_path


def test_triplot_png(sampled):
    bez, x, u, tmp = sampled
    import matplotlib
    matplotlib.use('Agg')
    export.triplot('sol.png', x, u, tri=bez.tri, hull=bez.hull)
    p = tmp / 'sol.png'
    assert p.exists() and p.stat().st_size > 500


def test_vtk_roundtrip(sampled):
    bez, x, u, tmp = sampled
    export.vtk('out', bez.tri, x, sol=u)
    data = (tmp / 'out.vtk').read_bytes()
    assert data.startswith(b'# vtk DataFile Version')
    assert b'UNSTRUCTURED_GRID' in data
    assert b'sol' in data
    # legacy vtk: big-endian float64 point block after the POINTS header
    head, _, rest = data.partition(b'POINTS ')
    npts = int(rest.split()[0])
    assert npts == len(x)


def test_vtk_3d(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import matplotlib
    matplotlib.use('Agg')
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 2)] * 3)
    bez = topo.sample('bezier', 2)
    x = numpy.asarray(bez.eval(geom, {}))
    export.vtk('vol', bez.tri, x, temp=x[:, 0])
    assert (tmp_path / 'vol.vtk').stat().st_size > 200
