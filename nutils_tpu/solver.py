'''Solver layer: System, iterative methods, constraint handling.

Re-design of the reference's solver (reference: solver.py:189 ``System``).
The reference differentiates the residual symbolically per IR node to obtain
sparse jacobian blocks (solver.py:238-258 via evaluable.derivative).  Here we
exploit FEM locality directly with JAX AD:

* Every appearance of a trial/test argument in a lowered integral is a
  *localized gather* ``GatherAlong(broadcast(arg), dofs)`` produced by the
  IR's contraction rules — per-element local dof values.  Each such node is
  replaced by a Leaf (a "localization").

* Residual vectors are unified into the energy form: a residual tuple (R_t)
  becomes the scalar E = sum_t R_t . v*_t with synthetic test arguments v*_t,
  whose gathers localize through the same rules.  The residual is then always
  ``jax.grad`` of the compiled scalar with respect to each test Leaf,
  scattered by the (constant) dof tables.

* Jacobian blocks are seeded ``jax.jvp`` passes of those residual chunks with
  respect to each trial Leaf: tangent seeds enumerate local dofs, broadcast
  over the element axis (valid because every integral is elementwise in its
  element batch), yielding exact per-element dense blocks [E, P, L_t, L_u]
  that scatter into a host-precomputed CSR pattern (matrix.SparsePattern).

The whole assemble step is one jitted function: gather -> einsum quadrature
-> AD -> segment scatter, entirely on device.
'''

import functools

import numpy

from . import evaluable as ev
from . import function, matrix
from .utils import _log as log


class SolverError(Exception):
    pass


# ------------------------------------------------------------ localization

class _Loc:
    '''One localized appearance of an argument in an expression.

    ``leaf`` replaces the gather node; ``argidx`` is a numpy int array
    (broadcastable to leaf.shape) holding the flat argument index of each leaf
    entry; ``seed_axes`` are the leaf axes that enumerate distinct argument
    entries per element (axes > 0 where argidx varies).  ``dense`` marks a
    non-localized (whole-argument) appearance with no element axis.
    '''

    def __init__(self, name, argshape, leaf, argidx, dense=False):
        self.name = name
        self.argshape = argshape
        self.leaf = leaf
        self.argidx = argidx
        self.dense = dense
        if dense:
            self.seed_axes = tuple(range(argidx.ndim))
        else:
            self.seed_axes = tuple(ax for ax in range(1, argidx.ndim) if argidx.shape[ax] > 1)
        self.nseeds = int(numpy.prod([leaf.shape[ax] for ax in self.seed_axes], dtype=numpy.int64)) if self.seed_axes else 1

    def leaf_value(self, args):
        import jax.numpy as jnp
        from .utils import config
        flat = jnp.asarray(args[self.name], dtype=config.float_dtype()).reshape(-1)
        return jnp.broadcast_to(flat[self.argidx], self.leaf.shape)

    def seeds(self):
        '''[S, *leaf.shape] tangent basis: identity over the seed axes,
        broadcast over element/point axes.'''
        import jax.numpy as jnp
        from .utils import config
        S = self.nseeds
        shape = [S] + [self.leaf.shape[ax] if ax in self.seed_axes else 1 for ax in range(len(self.leaf.shape))]
        eye = jnp.eye(S, dtype=config.float_dtype()).reshape(shape)
        return jnp.broadcast_to(eye, (S,) + self.leaf.shape)

    def cols(self):
        '''[E, S] (or [1, S] for dense) flat argument index per (element, seed).'''
        sq = self.argidx
        assert all(sq.shape[ax] == 1 for ax in range(sq.ndim) if ax not in self.seed_axes and (self.dense or ax != 0))
        if self.dense:
            return sq.reshape(1, -1)
        keep = [sq.shape[0]] + [sq.shape[ax] for ax in self.seed_axes]
        sq = sq.reshape(keep)
        return sq.reshape(sq.shape[0], -1)


_loc_counter = [0]


def _arg_indices(node, names):
    '''Resolve a node that is a (possibly nested) constant gather of a
    broadcast argument: returns (Argument, flat-index array broadcastable to
    node.shape), or None.  Handles GatherAlong chains (tensor-product bases
    contracted per factor) by composing the index tables host-side.'''
    if isinstance(node, ev.GatherAlong):
        if node.dofs.arguments or node.dofs.leafdeps:
            return None
        inner = _arg_indices(node.func, names)
        if inner is None:
            return None
        arg, idx = inner
        dofs_np = _eval_const(node.dofs).astype(numpy.int64)
        # compose: out[..., l, ...] = idx[..., dofs[..., l, ...], ...]
        # (take_along_axis broadcasts unit axes, keeping memory small)
        return arg, numpy.take_along_axis(idx, dofs_np, node.axis)
    core = _argcore(node)
    if core is None:
        return None
    arg, axmap, table = core
    if arg.name not in names:
        return None
    arg_axes = {core_ax: leaf_ax for leaf_ax, core_ax in enumerate(axmap) if core_ax is not None}
    strides = numpy.cumprod([1] + list(arg.shape[::-1][:-1]))[::-1].astype(numpy.int64)
    shape0 = [1] * len(node.shape)
    ax0 = arg_axes.get(0)
    assert ax0 is not None, 'argument axis lost in broadcast'
    base = (table if table is not None else numpy.arange(arg.shape[0])).astype(numpy.int64) * strides[0]
    shape0[ax0] = len(base)
    idx = base.reshape(shape0)
    for core_ax in range(1, len(arg.shape)):
        leaf_ax = arg_axes.get(core_ax)
        assert leaf_ax is not None, 'argument axis lost in broadcast'
        n = arg.shape[core_ax]
        shape = [1] * len(node.shape)
        shape[leaf_ax] = n
        idx = idx + numpy.arange(n, dtype=numpy.int64).reshape(shape) * strides[core_ax]
    return arg, idx


def _localize(expr, names):
    '''Replace localized gathers (and remaining direct appearances) of the
    named arguments by Leafs.  Returns (new_expr, {name: [_Loc]}).'''
    mapping = {}
    locs = {name: [] for name in names}

    candidates = []
    for node in ev.find(expr, lambda n: isinstance(n, ev.GatherAlong)):
        res = _arg_indices(node, names)
        if res is not None:
            candidates.append((node, res))
    # keep outermost candidates only (nested gathers are consumed by their parent)
    nodes = [n for n, _ in candidates]
    keep = []
    for i, (node, res) in enumerate(candidates):
        inner_of_other = any(other is not node and node in set(ev.find(other, lambda n: n is node))
                             for other in nodes)
        if not inner_of_other:
            keep.append((node, res))

    for node, (arg, idx) in keep:
        _loc_counter[0] += 1
        leaf = ev.Leaf(('loc', _loc_counter[0]), node.shape, float)
        mapping[node] = leaf
        locs[arg.name].append(_Loc(arg.name, arg.shape, leaf, idx))

    new_expr = ev.replace(expr, mapping)

    for name in names:  # remaining direct (dense) appearances
        for argnode in [a for a in new_expr.arguments if a.name == name]:
            _loc_counter[0] += 1
            leaf = ev.Leaf(('loc', _loc_counter[0]), argnode.shape, float)
            new_expr = ev.replace(new_expr, {argnode: leaf})
            idx = numpy.arange(int(numpy.prod(argnode.shape, dtype=numpy.int64)), dtype=numpy.int64).reshape(argnode.shape)
            locs[name].append(_Loc(name, argnode.shape, leaf, idx, dense=True))

    return new_expr, locs


def _argcore(node):
    '''If node is a pure broadcast (InsertAxis/Transpose) of an Argument — or
    of a constant re-indexing Take of one (block/vectorized bases) — return
    (argument, axismap node_axis -> arg_axis or None, index_table or None).'''
    factors = ev._decompose_product(node)
    if len(factors) != 1:
        return None
    core = factors[0].core
    if isinstance(core, ev.Argument):
        return core, factors[0].axismap, None
    if isinstance(core, ev.Take) and core.axis == 0 and isinstance(core.children[0], ev.Argument) \
            and isinstance(core.children[1], ev.Constant) and core.children[1].ndim == 1:
        return core.children[0], factors[0].axismap, core.children[1].value
    return None


def _eval_const(node):
    if isinstance(node, ev.Constant):
        return node.value
    assert not node.arguments and not node.leafdeps, 'dof table is not constant'
    return ev.eval_once(node)


def _additive_terms(expr):
    if isinstance(expr, ev.Add):
        return _additive_terms(expr.children[0]) + _additive_terms(expr.children[1])
    if isinstance(expr, ev.Multiply):
        # distribute constant scalar factors (e.g. a global tolerance scaling)
        # over sums so per-term sparsity analysis sees the individual integrals
        a, b = expr.children
        for x, y in ((a, b), (b, a)):
            if isinstance(x, ev.Add) and not y.arguments and not y.leafdeps:
                return [t for u in _additive_terms(x) for t in _additive_terms(ev.multiply(u, y))]
    return [expr]


def _scalarize(res_array, testname):
    '''Contract a residual vector with a synthetic test argument *inside* each
    integral: sum_t integral(R_t) . v becomes sum_t integral(R_t . v), keeping
    every term's test/trial gathers on the same element batch so that
    localization-based jacobian assembly stays per-element.'''
    from .sample import _Integral
    v = function.Argument(testname, res_array.shape)

    def walk(arr, sign):
        if isinstance(arr, function._Add):
            return walk(arr.operands[0], sign) + walk(arr.operands[1], sign)
        if isinstance(arr, function._Neg):
            return walk(arr.operands[0], -sign)
        return [(arr, sign)]

    out = None
    for term, sign in walk(res_array, 1):
        if isinstance(term, _Integral) and term.integrand.ndim == res_array.ndim:
            inner = function.sum_(function.multiply(term.integrand, v), tuple(range(res_array.ndim)))
            e = term.sample.integral(inner)
        else:
            e = function.sum_(function.multiply(term, v), tuple(range(res_array.ndim)))
        if sign < 0:
            e = function.negative(e)
        out = e if out is None else function.add(out, e)
    return out if out is not None else function.asarray(0.0)


def _chunk_rewrite(expr, mapping, E, ce):
    '''ev.replace plus rewriting of element-axis broadcasts: InsertAxis nodes
    of length E (constants broadcast over the element batch) become length-ce
    inserts so the rebuilt expression is uniformly chunk-sized.'''
    memo = {}

    def rec(node):
        if node in mapping:
            return mapping[node]
        hit = memo.get(node)
        if hit is not None:
            return hit
        if not node.children:
            out = node
        else:
            newc = tuple(rec(c) for c in node.children)
            if isinstance(node, ev.InsertAxis) and node.length == E:
                out = ev.insertaxis(newc[0], node.axis, ce)
            elif all(a is b for a, b in zip(newc, node.children)):
                out = node
            else:
                out = ev._rebuild(node, newc)
        memo[node] = out
        return out
    return rec(expr)


class _Chunk:
    '''One additive contribution to a residual block: a grad-values function,
    constant broadcastable flat row indices, and the trial localizations the
    values can depend on.'''

    def __init__(self, rows, fn, leafdeps, shape):
        self.rows = rows
        self.fn = fn
        self.leafdeps = leafdeps
        self.shape = shape


class System:
    '''A linear or nonlinear system of equations (reference: solver.py:189).'''

    def __init__(self, residual, /, trial, test=None):
        self.trials = tuple(trial.split(',') if isinstance(trial, str) else trial)

        # a sum of function.linearize terms over one functional is the energy
        # formulation in disguise: unwrap so assembly uses localized AD
        if test is None and not isinstance(residual, (tuple, list)):
            lin = function._unwrap_linearized(residual, self.trials)
            if lin is not None:
                residual = lin

        if isinstance(residual, (tuple, list)):
            if test is not None:
                raise ValueError('test arguments are not allowed with residual vectors')
            res_arrays = [function.asarray(r) for r in residual]
            assert len(res_arrays) == len(self.trials), 'one residual vector per trial argument'
            self.is_symmetric = False
            tests = tuple(f'__test_{i}__' for i in range(len(res_arrays)))
            value = None
            for r, tname in zip(res_arrays, tests):
                term = _scalarize(r, tname)
                value = term if value is None else function.add(value, term)
            self._synthetic_tests = tests
            linear_degree = 1
        else:
            value = function.asarray(residual)
            if value.ndim != 0:
                raise ValueError('System requires a scalar functional')
            tests = self.trials if test is None else tuple(test.split(',') if isinstance(test, str) else test)
            self.is_symmetric = tests == self.trials
            self._synthetic_tests = ()
            # a true energy (no explicit tests) is linear when quadratic in the
            # trials; with explicit test functions the functional already
            # carries the test factor, so the residual is linear iff the
            # functional is linear in the trials
            linear_degree = 2 if test is None else 1

        argspecs = dict(value.arguments)
        self.argshapes = {n: spec[0] for n, spec in argspecs.items()}
        for t in self.trials:
            assert t in self.argshapes, f'trial argument {t!r} does not appear in the residual'
        for t in tests:
            assert t in self.argshapes, f'test argument {t!r} does not appear in the residual'
        self.tests = tests
        self.trial_shapes = tuple(self.argshapes[t] for t in self.trials)
        self.test_shapes = tuple(self.argshapes[t] for t in tests)
        trial_sizes = [int(numpy.prod(s, dtype=numpy.int64)) for s in self.trial_shapes]
        test_sizes = [int(numpy.prod(s, dtype=numpy.int64)) for s in self.test_shapes]
        toffs = numpy.cumsum([0] + trial_sizes)
        roffs = numpy.cumsum([0] + test_sizes)
        self._trial_slices = [slice(int(a), int(b)) for a, b in zip(toffs[:-1], toffs[1:])]
        self._test_slices = [slice(int(a), int(b)) for a, b in zip(roffs[:-1], roffs[1:])]
        self._ntrial = int(toffs[-1])
        self._ntest = int(roffs[-1])
        assert self._ntrial == self._ntest, 'jacobian must be square'

        # ---- localize and build chunks
        E_ir = ev.astype(value.lower(function.EMPTY_LOWER_ARGS), float)
        deg = ev.poly_degree(E_ir, frozenset(self.trials))
        self.is_linear = deg <= linear_degree
        resargs = {a.name for a in E_ir.arguments} - set(self._synthetic_tests)
        self.is_constant_matrix = self.is_linear and resargs <= set(self.trials) | set(tests)
        self.arguments = frozenset(resargs)

        names = frozenset(tests) | frozenset(self.trials)
        E_loc, locs = _localize(E_ir, names)
        E_loc = ev._promote_big_constants([E_loc])[0]
        self._expr = E_loc
        self._comp = ev.compile(E_loc)
        self._locs = locs
        self._trial_locs = {u: locs[u] for u in self.trials}

        terms = _additive_terms(E_loc)
        lockeys = {loc.leaf.key for ll in locs.values() for loc in ll}
        term_lockeys = [frozenset(l.key for l in t.leafdeps if l.key in lockeys) for t in terms]

        self._blocks = []
        for ti, t in enumerate(tests):
            chunks = []
            for loc in locs[t]:
                # trial leaves that share an additive term with this test leaf
                deps = frozenset().union(*(tk for tk in term_lockeys if loc.leaf.key in tk)) if term_lockeys else frozenset()
                trial_keys = deps & {l.leaf.key for u in self.trials for l in self._trial_locs[u]}

                # compile only the terms this test localization appears in:
                # the gradient is identical (other terms are constant in the
                # leaf), the traced graph is much smaller, and — crucially —
                # unrelated integrals never share an XLA fusion with this
                # gradient (wide fusions across unrelated element batches have
                # been observed to miscompute on some CPU backends)
                dep_terms = [tm for tm, tk in zip(terms, term_lockeys) if loc.leaf.key in tk]
                expr_dep = dep_terms[0] if dep_terms else E_loc
                for tm in dep_terms[1:]:
                    expr_dep = ev.add(expr_dep, tm)
                comp_dep = ev.compile(expr_dep)

                def fn(args, overrides, tables, _loc=loc, _comp=comp_dep):
                    import jax
                    leaves = self._bound_leaves(args, overrides, tables)

                    def scalar(x):
                        lv = dict(leaves)
                        lv[_loc.leaf.key] = x
                        return _comp.trace(args, lv)
                    return jax.grad(scalar)(leaves[_loc.leaf.key])
                chunks.append(_Chunk(loc.argidx, fn, trial_keys, loc.leaf.shape))
            self._blocks.append(chunks)

        self._cache = {}

    # -------------------------------------------------------- helpers

    def _bound_leaves(self, args, overrides, tables):
        leaves = dict(tables)
        for ll in self._locs.values():
            for loc in ll:
                key = loc.leaf.key
                v = overrides.get(key)
                leaves[key] = v if v is not None else loc.leaf_value(args)
        return leaves

    def _tables(self):
        '''Default bindings (sample coordinate / promoted constant tables) of
        the compiled functional, passed through the jit boundary as runtime
        inputs; device-committed once and reused.'''
        import jax
        cached = self._cache.get('tables')
        if cached is None:
            cached = {}
            for key, node in self._comp.leafnodes.items():
                if node.value is not None:
                    cached[key] = node.value if not isinstance(node.value, numpy.ndarray) \
                        else jax.device_put(node.value.astype(
                            ev._concrete_dtype(node.dtype), copy=False))
            self._cache['tables'] = cached
        return cached

    def _clean(self, arguments):
        out = {}
        for name, shape in self.argshapes.items():
            v = arguments.get(name)
            if v is None and (name in self._synthetic_tests or name in self.tests):
                # test-function values never influence the residual/jacobian
                # (the residual IS the derivative with respect to them)
                out[name] = numpy.ones(shape)
            else:
                assert v is not None, f'missing argument {name!r}'
                out[name] = numpy.asarray(v, dtype=float)
        # pass through any extra arguments the expressions may close over
        for name, v in arguments.items():
            if name not in out and not isinstance(v, str):
                out[name] = numpy.asarray(v, dtype=float)
        return out

    # -------------------------------------------------------- traces

    def _residual_trace(self, args, tables):
        import jax.numpy as jnp
        from .utils import config
        parts = []
        for chunks, sl in zip(self._blocks, self._test_slices):
            n = sl.stop - sl.start
            r = jnp.zeros(n, dtype=config.float_dtype())
            for c in chunks:
                v = c.fn(args, {}, tables)
                rows = jnp.broadcast_to(jnp.asarray(c.rows), c.shape)
                r = r.at[rows.ravel()].add(v.ravel())
            parts.append(r)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def _value_trace(self, args, tables):
        return self._comp.trace(args, self._bound_leaves(args, {}, tables))

    @functools.cached_property
    def _jac_layout(self):
        '''(chunk_meta, SparsePattern): one meta entry per (chunk, trial loc)
        pair, aligned with the value order of _jacobian_trace.'''
        chunk_meta = []
        rows_all = []
        cols_all = []
        for bi, chunks in enumerate(self._blocks):
            row_off = self._test_slices[bi].start
            for ci, c in enumerate(chunks):
                for u in self.trials:
                    col_off = self._trial_slices[self.trials.index(u)].start
                    for li, loc in enumerate(self._trial_locs[u]):
                        if loc.leaf.key not in c.leafdeps:
                            continue
                        S = loc.nseeds
                        vshape = c.shape + (S,)
                        rows_b = c.rows.reshape(c.rows.shape + (1,))
                        cols_es = loc.cols()  # [E, S] or [1, S]
                        if loc.dense or cols_es.shape[0] == 1:
                            cols_b = cols_es.reshape((1,) * len(c.shape) + (S,))
                        else:
                            assert len(c.shape) and c.shape[0] == cols_es.shape[0], \
                                'row chunk and trial localization live on different element batches'
                            cols_b = cols_es.reshape((cols_es.shape[0],) + (1,) * (len(c.shape) - 1) + (S,))
                        reduce_axes = tuple(ax for ax in range(len(vshape))
                                            if rows_b.shape[ax] == 1 and cols_b.shape[ax] == 1 and vshape[ax] > 1)
                        sel = tuple(0 if ax in reduce_axes else slice(None) for ax in range(len(vshape)))
                        rows_k = numpy.broadcast_to(rows_b, vshape)[sel]
                        cols_k = numpy.broadcast_to(cols_b, vshape)[sel]
                        rows_all.append((rows_k + row_off).ravel())
                        cols_all.append((cols_k + col_off).ravel())
                        chunk_meta.append((bi, ci, u, li, reduce_axes, rows_k.size))
        rows_cat = numpy.concatenate(rows_all) if rows_all else numpy.zeros(0, dtype=numpy.int64)
        cols_cat = numpy.concatenate(cols_all) if cols_all else numpy.zeros(0, dtype=numpy.int64)
        pattern = matrix.SparsePattern(rows_cat, cols_cat, (self._ntest, self._ntrial))
        return chunk_meta, pattern

    def _jacobian_trace(self, args, tables):
        import jax
        import jax.numpy as jnp
        from .utils import config
        chunk_meta, pattern = self._jac_layout
        vals = []
        for bi, ci, u, li, reduce_axes, _size in chunk_meta:
            c = self._blocks[bi][ci]
            loc = self._trial_locs[u][li]
            x0 = loc.leaf_value(args)

            def one(seed, _c=c, _loc=loc, _x0=x0):
                import jax as _jax
                return _jax.jvp(lambda x: _c.fn(args, {_loc.leaf.key: x}, tables), (_x0,), (seed,))[1]
            seeds = loc.seeds()
            block = config.seed_block.value
            if block and seeds.shape[0] > block:
                # bound HBM: vmap over seed blocks, loop blocks sequentially
                from jax import lax
                S = seeds.shape[0]
                nb = -(-S // block)
                pad = nb * block - S
                seeds_b = jnp.concatenate([seeds, jnp.zeros((pad,) + seeds.shape[1:], seeds.dtype)]) \
                    .reshape((nb, block) + seeds.shape[1:]) if pad else seeds.reshape((nb, block) + seeds.shape[1:])
                V = lax.map(jax.vmap(one), seeds_b)          # [nb, block, *cshape]
                V = V.reshape((nb * block,) + V.shape[2:])[:S]
            else:
                V = jax.vmap(one)(seeds)     # [S, *cshape]
            V = jnp.moveaxis(V, 0, -1)       # [*cshape, S]
            if reduce_axes:
                V = V.sum(axis=reduce_axes)
            vals.append(V.ravel())
        flat = jnp.concatenate(vals) if len(vals) > 1 else vals[0]
        return pattern.scatter(flat)

    # ------------------------------------------- element-chunked assembly

    def _scan_plan(self):
        '''Element-chunked assembly plan for huge element batches, or None.

        When the dominant sample's element count exceeds config.assembly_chunk,
        the localized functional is split into the additive terms living on
        that batch (rebuilt with chunk-sized leaves and evaluated under
        lax.scan, so quadrature intermediates of only one chunk are live at a
        time) plus the remaining small terms (evaluated once).'''
        if 'scanplan' not in self._cache:
            from .utils import config
            try:
                self._cache['scanplan'] = self._build_scan_plan(int(config.assembly_chunk.value))
            except Exception as e:  # pragma: no cover - conservative fallback
                log.info(f'chunked assembly disabled: {e!r}')
                self._cache['scanplan'] = None
        return self._cache['scanplan']

    def _build_scan_plan(self, chunk):
        if chunk <= 0:
            return None
        leaf_nodes = [n for n in ev.find(self._expr, lambda n: isinstance(n, ev.Leaf))]
        sizes = [n.shape[0] for n in leaf_nodes if n.value is not None and len(n.shape)]
        if not sizes:
            return None
        E = max(sizes)
        if E <= chunk:
            return None
        ce = next(d for d in range(chunk, 0, -1) if E % d == 0)
        nc = E // ce
        if nc == 1:
            return None
        locleafs = {loc.leaf: loc for ll in self._locs.values() for loc in ll}
        chunk_nodes = set()
        for n in leaf_nodes:
            if len(n.shape) and n.shape[0] == E:
                if n.value is None and n not in locleafs:
                    raise ValueError(f'unrecognized element-batched leaf {n.key!r}')
                chunk_nodes.add(n)
        terms = _additive_terms(self._expr)
        big_terms = [t for t in terms if set(t.leafdeps) & chunk_nodes]
        if not big_terms:
            return None
        small_terms = [t for t in terms if not (set(t.leafdeps) & chunk_nodes)]
        Ebig = big_terms[0]
        for t in big_terms[1:]:
            Ebig = ev.add(Ebig, t)
        Esmall = None
        for t in small_terms:
            Esmall = t if Esmall is None else ev.add(Esmall, t)
        mapping = {}
        ckey = {}
        for n in chunk_nodes:
            nk = ('ck',) + (n.key if isinstance(n.key, tuple) else (n.key,))
            mapping[n] = ev.Leaf(nk, (ce,) + tuple(n.shape[1:]), n.dtype)
            ckey[n.key] = nk
        comp_big = ev.compile(_chunk_rewrite(Ebig, mapping, E, ce))
        comp_small = ev.compile(Esmall) if Esmall is not None else None
        # classify localizations
        chunk_lockeys = {n.key for n in chunk_nodes if n in locleafs}
        chunk_tabkeys = {n.key for n in chunk_nodes if n.value is not None}
        return dict(E=E, ce=ce, nc=nc, comp_big=comp_big, comp_small=comp_small,
                    ckey=ckey, chunk_lockeys=chunk_lockeys, chunk_tabkeys=chunk_tabkeys)

    def _scan_xs(self, plan):
        '''Static per-chunk scan inputs: chunked tables, localization index
        windows, residual row maps and jacobian slot maps (device arrays).'''
        import jax
        import jax.numpy as jnp
        cached = self._cache.get('scanxs')
        if cached is not None:
            return cached
        E, ce, nc = plan['E'], plan['ce'], plan['nc']
        chunk_meta, pattern = self._jac_layout
        xs = {}
        fixed = {}
        for key, val in self._tables().items():
            if key in plan['chunk_tabkeys']:
                xs['t', plan['ckey'][key]] = jnp.reshape(val, (nc, ce) + val.shape[1:])
            else:
                fixed[key] = val
        idx_dtype = numpy.int32 if self._ntrial < 2**31 and E * 64 < 2**31 else numpy.int64
        locinfo = {}
        for name, ll in self._locs.items():
            for li, loc in enumerate(ll):
                if loc.leaf.key not in plan['chunk_lockeys']:
                    continue
                ai = loc.argidx
                if ai.shape[0] == E:
                    xs['i', plan['ckey'][loc.leaf.key]] = jax.device_put(
                        ai.reshape((nc, ce) + ai.shape[1:]).astype(idx_dtype))
                    locinfo[loc.leaf.key] = ('x', name, (ce,) + tuple(loc.leaf.shape[1:]))
                else:
                    fixed['i', plan['ckey'][loc.leaf.key]] = jax.device_put(ai.astype(idx_dtype))
                    locinfo[loc.leaf.key] = ('f', name, (ce,) + tuple(loc.leaf.shape[1:]))
        # residual rows per big test loc
        rowmaps = {}
        for bi, t in enumerate(self.tests):
            off = self._test_slices[bi].start
            for ci, loc in enumerate(self._locs[t]):
                if loc.leaf.key not in plan['chunk_lockeys']:
                    continue
                rows = numpy.broadcast_to(loc.argidx, loc.leaf.shape) + off
                xs['r', bi, ci] = jax.device_put(rows.reshape((nc, ce) + rows.shape[1:]).astype(idx_dtype))
                rowmaps[bi, ci] = True
        # jacobian slot segments per big meta entry
        offs = numpy.cumsum([0] + [m[-1] for m in chunk_meta])
        bigmeta = []
        for mi, (bi, ci, u, li, reduce_axes, size) in enumerate(chunk_meta):
            loc_t = self._locs[self.tests[bi]][ci]
            if loc_t.leaf.key not in plan['chunk_lockeys']:
                continue
            assert size % E == 0, 'jacobian entry is not element-major'
            slots = pattern.slot[offs[mi]:offs[mi + 1]].reshape(E, size // E)
            xs['s', mi] = jax.device_put(slots.reshape(nc, ce, size // E).astype(idx_dtype))
            bigmeta.append((mi, bi, ci, u, li, reduce_axes))
        smallmeta = [(mi,) + m[:-1] for mi, m in enumerate(chunk_meta)
                     if self._locs[self.tests[m[0]]][m[1]].leaf.key not in plan['chunk_lockeys']]
        cached = dict(xs=xs, fixed=fixed, locinfo=locinfo, rowmaps=rowmaps,
                      bigmeta=bigmeta, smallmeta=smallmeta, offs=offs)
        self._cache['scanxs'] = cached
        return cached

    def _scan_assemble(self, args, xs, fixed, want_jac, want_res, want_val=False):
        '''Residual / jacobian-values / value via lax.scan over element chunks
        of the dominant sample, plus the unchunked small-term remainder.
        ``xs``/``fixed`` are the precomputed per-chunk and whole tables passed
        through the jit boundary (see _scan_xs).'''
        import jax
        import jax.numpy as jnp
        from jax import lax
        from .utils import config
        plan = self._scan_plan()
        sx = dict(self._cache['scanxs'], xs=xs, fixed=fixed)
        chunk_meta, pattern = self._jac_layout
        comp_big, comp_small = plan['comp_big'], plan['comp_small']
        fdt = config.float_dtype()
        flats = {name: jnp.asarray(args[name], dtype=fdt).reshape(-1) for name in self.argshapes}

        def loc_value(key, xslice, fixedmap):
            kind, name, shape = sx['locinfo'][key]
            idx = xslice[('i', plan['ckey'][key])] if kind == 'x' else fixedmap[('i', plan['ckey'][key])]
            return jnp.broadcast_to(flats[name][idx], shape)

        def big_leaves(xsl):
            leaves = {}
            for key, val in sx['fixed'].items():
                if isinstance(key, tuple) and key and key[0] == 'i':
                    continue
                leaves[key] = val
            for k in xsl:
                if k[0] == 't':
                    leaves[k[1]] = xsl[k]
            for key in plan['chunk_lockeys']:
                leaves[plan['ckey'][key]] = loc_value(key, xsl, sx['fixed'])
            for name, ll in self._locs.items():
                for loc in ll:
                    if loc.leaf.key not in plan['chunk_lockeys']:
                        leaves[loc.leaf.key] = loc.leaf_value(args)
            return leaves

        def body(carry, xsl):
            data, r, val = carry
            leaves = big_leaves(xsl)

            def scalar_at(key, x):
                lv = dict(leaves)
                lv[key] = x
                return comp_big.trace(args, lv)
            if want_val:
                val = val + comp_big.trace(args, leaves)
            if want_res:
                for bi, t in enumerate(self.tests):
                    for ci, loc in enumerate(self._locs[t]):
                        if (bi, ci) not in sx['rowmaps']:
                            continue
                        key = plan['ckey'][loc.leaf.key]
                        g = jax.grad(lambda x: scalar_at(key, x))(leaves[key])
                        r = r.at[xsl[('r', bi, ci)].ravel()].add(g.ravel())
            if want_jac:
                for mi, bi, ci, u, li, reduce_axes in sx['bigmeta']:
                    loc_t = self._locs[self.tests[bi]][ci]
                    loc_u = self._trial_locs[u][li]
                    tkey = plan['ckey'][loc_t.leaf.key]
                    ukey = plan['ckey'][loc_u.leaf.key] if loc_u.leaf.key in plan['chunk_lockeys'] else None
                    if ukey is None:
                        x0 = loc_u.leaf_value(args)
                        base_key = loc_u.leaf.key
                    else:
                        x0 = leaves[ukey]
                        base_key = ukey

                    def one(seed):
                        def inner(x):
                            lv = dict(leaves)
                            lv[base_key] = x
                            return jax.grad(lambda y: (lambda l2: comp_big.trace(args, l2))(
                                {**lv, tkey: y}))(lv[tkey])
                        return jax.jvp(inner, (x0,), (seed,))[1]
                    seeds = loc_u.seeds()
                    if ukey is not None:
                        seeds = jnp.broadcast_to(
                            seeds[(slice(None), slice(0, 1)) + (slice(None),) * (seeds.ndim - 2)],
                            (seeds.shape[0], plan['ce']) + seeds.shape[2:])
                    V = jax.vmap(one)(seeds)          # [S, ce, ...]
                    V = jnp.moveaxis(V, 0, -1)        # [ce, ..., S]
                    red = tuple(ax for ax in reduce_axes)
                    if red:
                        V = V.sum(axis=red)
                    data = data.at[xsl[('s', mi)].ravel()].add(V.reshape(-1))
            return (data, r, val), None

        data0 = jnp.zeros(pattern.nnz if want_jac else 0, dtype=fdt)
        r0 = jnp.zeros(self._ntest if want_res else 0, dtype=fdt)
        v0 = jnp.zeros((), dtype=fdt)
        (data, r, val), _ = lax.scan(body, (data0, r0, v0), sx['xs'])

        # ---- small-term remainder, evaluated once at full size
        if comp_small is not None:
            sleaves = {}
            for key, v in sx['fixed'].items():
                if not (isinstance(key, tuple) and key and key[0] == 'i'):
                    sleaves[key] = v
            for name, ll in self._locs.items():
                for loc in ll:
                    if loc.leaf.key not in plan['chunk_lockeys']:
                        sleaves[loc.leaf.key] = loc.leaf_value(args)

            def sscalar_at(key, x):
                lv = dict(sleaves)
                lv[key] = x
                return comp_small.trace(args, lv)
            if want_val:
                val = val + comp_small.trace(args, sleaves)
            if want_res:
                for bi, t in enumerate(self.tests):
                    off = self._test_slices[bi].start
                    for ci, loc in enumerate(self._locs[t]):
                        if (bi, ci) in sx['rowmaps']:
                            continue
                        g = jax.grad(lambda x: sscalar_at(loc.leaf.key, x))(sleaves[loc.leaf.key])
                        rows = jnp.broadcast_to(jnp.asarray(loc.argidx + off), loc.leaf.shape)
                        r = r.at[rows.ravel()].add(g.ravel())
            if want_jac:
                offs = sx['offs']
                for mi, bi, ci, u, li, reduce_axes in sx['smallmeta']:
                    loc_t = self._locs[self.tests[bi]][ci]
                    loc_u = self._trial_locs[u][li]
                    x0 = sleaves.get(loc_u.leaf.key, None)
                    if x0 is None:
                        x0 = loc_u.leaf_value(args)

                    def one(seed):
                        def inner(x):
                            lv = dict(sleaves)
                            lv[loc_u.leaf.key] = x
                            return jax.grad(lambda y: comp_small.trace(args, {**lv, loc_t.leaf.key: y}))(lv[loc_t.leaf.key])
                        return jax.jvp(inner, (x0,), (seed,))[1]
                    V = jax.vmap(one)(loc_u.seeds())
                    V = jnp.moveaxis(V, 0, -1)
                    if reduce_axes:
                        V = V.sum(axis=tuple(reduce_axes))
                    slots = jnp.asarray(pattern.slot[offs[mi]:offs[mi + 1]])
                    data = data.at[slots].add(V.reshape(-1))
        return data, r, val

    # -------------------------------------------------------- public assembly

    def _compiled_split(self, which):
        '''Per-chunk jitted assembly with host-side accumulation.  Used on the
        CPU backend: compiling every residual/jacobian chunk into one fused
        XLA program has been observed to MISCOMPUTE (NaN) on some hosts —
        jit(f) != f(deoptimized) — when unrelated element batches share a
        fusion.  Per-chunk programs sidestep the bad fusions; on TPU the
        single fused program is kept (config.fuse_assembly overrides).'''
        import jax
        import numpy as np
        from .utils import config
        fdt = config.float_dtype()

        res_fns = []  # (jitted, rows, slice)
        for chunks, sl in zip(self._blocks, self._test_slices):
            for c in chunks:
                jf = jax.jit(lambda args, tables, _c=c: _c.fn(args, {}, tables))
                res_fns.append((jf, np.broadcast_to(c.rows, c.shape).ravel() + sl.start, c.shape))

        chunk_meta, pattern = self._jac_layout
        offs = np.cumsum([0] + [m[-1] for m in chunk_meta])

        jac_fns = []  # (jitted, slot segment)
        for mi, (bi, ci, u, li, reduce_axes, _size) in enumerate(chunk_meta):
            c = self._blocks[bi][ci]
            loc = self._trial_locs[u][li]

            def jfn(args, tables, _c=c, _loc=loc, _red=tuple(reduce_axes)):
                import jax as _jax
                import jax.numpy as jnp
                x0 = _loc.leaf_value(args)

                def one(seed):
                    return _jax.jvp(lambda x: _c.fn(args, {_loc.leaf.key: x}, tables), (x0,), (seed,))[1]
                V = _jax.vmap(one)(_loc.seeds())
                V = jnp.moveaxis(V, 0, -1)
                if _red:
                    V = V.sum(axis=_red)
                return V.ravel()
            jac_fns.append((jax.jit(jfn), pattern.slot[offs[mi]:offs[mi + 1]]))

        def residual(clean):
            tables = self._tables()
            r = np.zeros(self._ntest, dtype=fdt)
            for jf, rows, _shape in res_fns:
                np.add.at(r, rows, np.asarray(jf(clean, tables), dtype=fdt).ravel())
            return r

        def jacobian(clean):
            tables = self._tables()
            data = np.zeros(pattern.nnz, dtype=fdt)
            for jf, slots in jac_fns:
                np.add.at(data, slots, np.asarray(jf(clean, tables), dtype=fdt))
            return data

        value = None
        if which in ('value',):
            import jax as _jax
            jv = _jax.jit(self._value_trace)
            value = lambda clean: jv(clean, self._tables())

        return {'residual': residual,
                'jacobian': jacobian,
                'value': value,
                'jacres': lambda clean: (jacobian(clean), residual(clean))}[which]

    def _compiled(self, which):
        import jax
        fn = self._cache.get(which)
        if fn is None:
            from .utils import config
            plan = self._scan_plan()
            if plan is None and not config.fuse_assembly.value and jax.default_backend() == 'cpu':
                fn = self._compiled_split(which)
                self._cache[which] = fn
                return fn
            if plan is not None:
                sx = self._scan_xs(plan)
                trace = {
                    'residual': lambda args, xs, fx: self._scan_assemble(args, xs, fx, False, True)[1],
                    'jacobian': lambda args, xs, fx: self._scan_assemble(args, xs, fx, True, False)[0],
                    'value': lambda args, xs, fx: self._scan_assemble(args, xs, fx, False, False, want_val=True)[2],
                    'jacres': lambda args, xs, fx: self._scan_assemble(args, xs, fx, True, True)[:2],
                }[which]
                jitted = jax.jit(trace)
                fn = lambda args: jitted(args, sx['xs'], sx['fixed'])
            else:
                trace = {'residual': self._residual_trace,
                         'jacobian': self._jacobian_trace,
                         'value': self._value_trace,
                         'jacres': lambda args, tables: (self._jacobian_trace(args, tables),
                                                         self._residual_trace(args, tables))}[which]
                jitted = jax.jit(trace)
                fn = lambda args: jitted(args, self._tables())
            self._cache[which] = fn
        return fn

    @log.withcontext
    def assemble_residual(self, arguments, x=None):
        arguments, free = self.construct(arguments, x, return_free=True)
        r = numpy.asarray(self._compiled('residual')(self._clean(arguments)))
        return r[free]

    @log.withcontext
    def assemble_jacobian(self, arguments, x=None):
        arguments, free = self.construct(arguments, x, return_free=True)
        jac = self._jac_matrix(self._clean(arguments))
        return jac.submatrix(free, free)

    def _jac_matrix(self, clean):
        if self.is_constant_matrix and 'jacmat' in self._cache:
            return self._cache['jacmat']
        _, pattern = self._jac_layout
        data = self._compiled('jacobian')(clean)
        jac = matrix.Matrix.from_pattern(pattern, numpy.asarray(data))
        if self.is_constant_matrix:
            self._cache['jacmat'] = jac
        return jac

    @log.withcontext
    def assemble_jacobian_residual(self, arguments, x=None):
        arguments, free = self.construct(arguments, x, return_free=True)
        clean = self._clean(arguments)
        if self.is_constant_matrix and 'jacmat' in self._cache:
            jac = self._cache['jacmat']
            r = numpy.asarray(self._compiled('residual')(clean))
        else:
            data, r = self._compiled('jacres')(clean)
            _, pattern = self._jac_layout
            jac = matrix.Matrix.from_pattern(pattern, numpy.asarray(data))
            r = numpy.asarray(r)
            if self.is_constant_matrix:
                self._cache['jacmat'] = jac
        return jac.submatrix(free, free), r[free]

    def assemble(self, arguments, x=None):
        jac, res = self.assemble_jacobian_residual(arguments, x)
        val = self.assemble_value(arguments, x) if self.is_symmetric else None
        return jac, res, val

    @log.withcontext
    def assemble_value(self, arguments, x=None):
        if not self.is_symmetric:
            raise SolverError('value is not defined for unsymmetric systems')
        arguments = self.construct(arguments, x)
        return float(self._compiled('value')(self._clean(arguments)))

    # -------------------------------------------------------- dof packing

    def deconstruct(self, arguments, constrain):
        '''Split trial arguments into NaN-marked templates plus the free-dof
        vector (reference: solver.py:275).'''
        arguments = dict(arguments)
        xparts = []
        for t, shape in zip(self.trials, self.trial_shapes):
            a = arguments.get(t)
            c = constrain.get(t)
            if a is None:
                if c is None:
                    a = numpy.full(shape, numpy.nan)
                elif numpy.asarray(c).dtype == bool:
                    a = numpy.full(shape, numpy.nan)
                    a[numpy.asarray(c)] = 0.
                else:
                    a = numpy.asarray(c, dtype=float)
                x = numpy.zeros(int(numpy.isnan(a).sum()))
            else:
                a = numpy.asarray(a, dtype=float)
                if c is None:
                    x = a.ravel().copy()
                    a = numpy.full(shape, numpy.nan)
                elif numpy.asarray(c).dtype == bool:
                    c = numpy.asarray(c)
                    x = a[~c]
                    a = a.copy()
                    a[~c] = numpy.nan
                else:
                    c = numpy.asarray(c, dtype=float)
                    x = a[numpy.isnan(c)]
                    a = c
                assert numpy.isfinite(x).all(), 'non-finite initial guess'
            arguments[t] = a
            xparts.append(numpy.asarray(x, dtype=float).ravel())
        return arguments, numpy.concatenate(xparts) if xparts else numpy.zeros(0)

    def construct(self, arguments, x=None, return_free=False):
        v = numpy.concatenate([numpy.asarray(arguments[t], dtype=float).ravel() for t in self.trials])
        free = numpy.isnan(v)
        if x is None:
            assert not free.any(), 'unresolved free dofs'
            free = numpy.ones_like(free)
        else:
            v = v.copy()
            v[free] = x
            arguments = dict(arguments) | {
                t: v[sl].reshape(shape) for t, shape, sl in zip(self.trials, self.trial_shapes, self._trial_slices)}
        return (arguments, free) if return_free else arguments

    # -------------------------------------------------------- solving

    @log.withcontext
    def solve(self, *, arguments=None, constrain=None, tol=0., miniter=0, maxiter=None, method=None):
        arguments = dict(arguments or {})
        constrain = dict(constrain or {})
        if method is None:
            method = (Direct if self.is_linear else Newton)()
        log.info(f'{"optimizing" if self.is_symmetric else "solving"} for {",".join(self.trials)} using {method}')
        m = method(self, arguments=arguments, constrain=constrain)
        if isinstance(m, tuple):
            arguments, resnorm = m
            log.info(f'residual norm: {resnorm:.1e}')
            if not numpy.isfinite(resnorm):
                raise SolverError('residual is not finite')
            if resnorm > tol > 0:
                raise SolverError(f'failed to reach tolerance {tol:.0e} (residual {resnorm:.1e})')
            return arguments
        if tol <= 0:
            raise ValueError('nonlinear solve requires a positive tolerance')
        arguments, resnorm = next(m)
        log.info(f'iter 0: residual norm {resnorm:.1e}')
        if not numpy.isfinite(resnorm):
            raise SolverError('residual is not finite')
        iiter = 0
        while iiter < miniter or resnorm > tol:
            if maxiter is not None and iiter >= maxiter:
                raise SolverError(f'failed to converge in {maxiter} iterations')
            iiter += 1
            arguments, resnorm = next(m)
            log.info(f'iter {iiter}: residual norm {resnorm:.1e}')
            if not numpy.isfinite(resnorm):
                raise SolverError('residual diverged')
        return arguments

    def step(self, *, arguments, suffix, timearg=None, timesteparg=None, timestep=None, maxretry=2, **solveargs):
        '''Advance one time step with timestep-halving retry
        (reference: solver.py:503-558).'''
        arguments = dict(arguments)
        for t in self.trials:
            if t in arguments:
                arguments[t + suffix] = arguments[t]
        if timearg or timesteparg:
            if timestep is None:
                raise ValueError('timearg/timesteparg require timestep')
            if timesteparg:
                arguments[timesteparg] = timestep
            if timearg:
                tval = arguments.get(timearg, 0.)
                arguments[timearg + suffix] = tval
                arguments[timearg] = tval + timestep
        try:
            return self.solve(arguments=arguments, **solveargs)
        except (SolverError, matrix.MatrixError) as e:
            if (timearg not in self.arguments and timesteparg not in self.arguments) or maxretry <= 0:
                raise
            log.error(f'error: {e}; retrying with timestep {timestep/2}')
            half = dict(solveargs, timestep=timestep / 2, timearg=timearg, timesteparg=timesteparg,
                        suffix=suffix, maxretry=maxretry - 1)
            halfway = self.step(arguments=arguments, **half)
            return self.step(arguments=halfway, **half)

    @log.withcontext
    def solve_constraints(self, *, droptol, arguments=None, constrain=None, linargs=None):
        '''Solve a possibly singular linear system, returning NaN for dofs
        that do not participate (reference: solver.py:562).'''
        arguments = dict(arguments or {})
        constrain = dict(constrain or {})
        if not self.is_linear:
            raise SolverError('system is not linear')
        arguments, x = self.deconstruct(arguments, constrain)
        jac, res = self.assemble_jacobian_residual(arguments, x)
        data, colidx, _ = jac.export('csr')
        mycons = numpy.ones(res.shape, dtype=bool)
        mycons[colidx[numpy.abs(data) > droptol]] = False
        dx = -jac.solve(res, constrain=mycons, symmetric=self.is_symmetric, **(linargs or {}))
        log.info(f'constrained {int(mycons.sum())} of {len(mycons)} dofs; residual norm '
                 f'{numpy.linalg.norm((jac @ dx + res)[~mycons]):.1e}')
        x = x + dx
        x[mycons] = numpy.nan
        arguments = self.construct(arguments, x)
        return dict(constrain) | {t: arguments[t] for t in self.trials}


# ------------------------------------------------------------ methods

class Direct:

    def __init__(self, **linargs):
        self.linargs = linargs

    def __str__(self):
        return 'direct'

    def __call__(self, system, *, arguments, constrain):
        if not system.is_linear:
            raise SolverError('problem is not linear')
        arguments, x = system.deconstruct(arguments, constrain)
        jac, res = system.assemble_jacobian_residual(arguments, x)
        dx = jac.solve(res, symmetric=system.is_symmetric, **self.linargs)
        x = x - dx
        return system.construct(arguments, x), float(numpy.linalg.norm(res - jac @ dx))


class Newton:

    def __init__(self, **linargs):
        self.linargs = dict(linargs)
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'newton'

    def __call__(self, system, *, arguments, constrain):
        arguments, x = system.deconstruct(arguments, constrain)
        while True:
            jac, res = system.assemble_jacobian_residual(arguments, x)
            yield system.construct(arguments, x), float(numpy.linalg.norm(res))
            dx = jac.solve_leniently(res, symmetric=system.is_symmetric, **self.linargs)
            x = x - dx


class LinesearchNewton:
    '''Newton with residual-norm backtracking (reference: solver.py:719 with
    the NormBased strategy, solver.py:57).'''

    def __init__(self, minscale=0.01, maxscale=2.0, **linargs):
        self.minscale = minscale
        self.maxscale = maxscale
        self.linargs = dict(linargs)
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'linesearch-newton'

    def __call__(self, system, *, arguments, constrain):
        arguments, x = system.deconstruct(arguments, constrain)
        jac, res = system.assemble_jacobian_residual(arguments, x)
        while True:
            yield system.construct(arguments, x), float(numpy.linalg.norm(res))
            dx = jac.solve_leniently(res, symmetric=system.is_symmetric, **self.linargs)
            res0norm = numpy.linalg.norm(res)
            scale = 1.0
            while True:
                xnew = x - scale * dx
                jac, res = system.assemble_jacobian_residual(arguments, xnew)
                if numpy.isfinite(res).all() and numpy.linalg.norm(res) <= res0norm * (1 - 0.1 * scale) + 1e-30:
                    break
                if scale <= self.minscale:
                    raise SolverError('linesearch stuck in local minimum')
                scale *= 0.5
            x = xnew


class Minimize:
    '''Energy descent for symmetric systems (reference: solver.py:773).'''

    def __init__(self, **linargs):
        self.linargs = dict(linargs)
        self.linargs.setdefault('rtol', 1e-3)

    def __str__(self):
        return 'minimize'

    def __call__(self, system, *, arguments, constrain):
        if not system.is_symmetric:
            raise SolverError('minimize requires a symmetric system')
        arguments, x = system.deconstruct(arguments, constrain)
        while True:
            jac, res = system.assemble_jacobian_residual(arguments, x)
            yield system.construct(arguments, x), float(numpy.linalg.norm(res))
            dx = jac.solve_leniently(res, symmetric=True, **self.linargs)
            E0 = system.assemble_value(arguments, x)
            scale = 1.0
            for attempt in range(40):
                if system.assemble_value(arguments, x - scale * dx) <= E0 + 1e-12 * (1 + abs(E0)):
                    break
                scale *= 0.5
            else:
                raise SolverError('stuck in local minimum')
            x = x - scale * dx


# ------------------------------------------------------------ legacy wrappers

def solve_linear(target, residual, *, constrain=None, arguments=None, **kwargs):
    '''Legacy functional API (reference: solver.py:940).'''
    if isinstance(target, str) and ':' in target:
        trial, test = target.split(':')
        sys = System(residual, trial=trial, test=test)
        cons = constrain if isinstance(constrain, dict) else {trial: constrain} if constrain is not None else {}
        return sys.solve(constrain=cons, arguments=arguments or {})[trial]
    sys = System(residual, trial=target)
    out = sys.solve(constrain=constrain or {}, arguments=arguments or {})
    return out[target] if isinstance(target, str) else out


def optimize(target, functional, *, tol=0., droptol=None, constrain=None, arguments=None, **kwargs):
    '''Minimize a functional (reference: solver.py:1213).'''
    sys = System(functional, trial=target)
    constrain = constrain or {}
    arguments = arguments or {}
    if droptol is not None:
        cons = sys.solve_constraints(droptol=droptol, arguments=arguments, constrain=constrain)
        return cons[target] if isinstance(target, str) else cons
    out = sys.solve(constrain=constrain, arguments=arguments, tol=tol)
    return out[target] if isinstance(target, str) else out
