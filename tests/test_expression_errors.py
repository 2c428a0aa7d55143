'''Expression-DSL error surface: message text and caret/tilde marker
positions, mirroring the reference parser's annotated ExpressionSyntaxError
(reference: expression_v2.py:208; test corpus: tests/test_expression_v2.py
Parser.*).  Every assertion checks the full three-line rendering — message,
expression, marker line — so the caret positions are pinned exactly.'''

import numpy
import pytest

from nutils_tpu.expression import ExpressionSyntaxError, Namespace


@pytest.fixture
def ns():
    ns = Namespace()
    ns.a = numpy.float64(5.0)
    ns.a2 = numpy.arange(2.0) + 1
    ns.a3 = numpy.arange(3.0) + 1
    ns.a22 = numpy.arange(4.0).reshape(2, 2) + 1
    ns.a23 = numpy.arange(6.0).reshape(2, 3) + 1
    ns.a32 = numpy.arange(6.0).reshape(3, 2) + 1
    ns.a222 = numpy.arange(8.0).reshape(2, 2, 2) + 1
    return ns


def assert_fails(ns, expression, message, markers):
    with pytest.raises(ExpressionSyntaxError) as info:
        expression @ ns
    assert str(info.value) == message + '\n' + expression + '\n' + markers, \
        f'got:\n{info.value}'


# ------------------------------------------------------- term index algebra

def test_missing_index_in_later_term(ns):
    assert_fails(ns, 'a2_i + a2_i + 3 + a2_i',
                 'Index i of the first term [^] is missing in the third term [~].',
                 '^^^^          ~')


def test_missing_index_in_first_term(ns):
    assert_fails(ns, '1 + a2_i + 3',
                 'Index i of the second term [~] is missing in the first term [^].',
                 '^   ~~~~')


def test_index_length_mismatch_across_terms(ns):
    assert_fails(ns, 'a23_ij + a23_ij + a23_ij + a32_ij',
                 'Index i has length 2 in the first term [^] but length 3 in the fourth term [~].',
                 '^^^^^^                     ~~~~~~')


def test_index_length_mismatch_within_term(ns):
    assert_fails(ns, '1 a2_i a3_i a',
                 'Index i is assigned to axes with different lengths: 2 and 3.',
                 '^^^^^^^^^^^')


def test_index_occurs_more_than_twice(ns):
    assert_fails(ns, '1 a22_ii a2_i a',
                 'Index i occurs more than twice.',
                 '^^^^^^^^^^^^^^^')


def test_index_occurs_more_than_twice_fraction(ns):
    assert_fails(ns, 'a2_i / a22_ii',
                 'Index i occurs more than twice.',
                 '^^^^^^^^^^^^^')


def test_index_more_than_twice_single_variable(ns):
    assert_fails(ns, 'a222_iii',
                 'Index i occurs more than twice.',
                 '^^^^^^^^')


# ------------------------------------------------------------- fractions

def test_repeated_fraction(ns):
    assert_fails(ns, '1 / 2 / 3',
                 'Repeated fractions are not allowed. Use parentheses if necessary.',
                 '^^^^^^^^^')


def test_nonscalar_denominator(ns):
    assert_fails(ns, '1 / a2_i',
                 'The denominator must have dimension zero.',
                 '    ^^^^')


# ------------------------------------------------------------- numbers

def test_number_not_at_start(ns):
    assert_fails(ns, '1 1',
                 'Numbers are only allowed at the start of a term.',
                 '  ^')


def test_number_after_variable(ns):
    assert_fails(ns, 'a 1',
                 'Numbers are only allowed at the start of a term.',
                 '  ^')


# ------------------------------------------------------------- variables

def test_unknown_variable(ns):
    assert_fails(ns, '1 + b_i + a2_i',
                 "Unknown variable 'b'.",
                 '    ^')


def test_too_many_indices(ns):
    assert_fails(ns, 'a2_ij',
                 "Expected 1 indices for variable 'a2' but got 2.",
                 '^^^^^')


def test_too_few_indices(ns):
    assert_fails(ns, '1 + a22_i',
                 "Expected 2 indices for variable 'a22' but got 1.",
                 '    ^^^^^')


def test_numeral_index_out_of_range(ns):
    assert_fails(ns, 'a2_3',
                 'Index 3 is out of range for axis of length 2.',
                 '   ^')


def test_missing_indices_after_underscore(ns):
    assert_fails(ns, 'a2_+1',
                 'Expected indices after the underscore.',
                 '   ^')


# ------------------------------------------------------------- structure

def test_unexpected_character(ns):
    assert_fails(ns, 'a2_i & a2_i',
                 "Unexpected character '&'.",
                 '     ^')


def test_unexpected_end(ns):
    assert_fails(ns, '1 +',
                 'Unexpected end of expression.',
                 '   ^')


def test_unbalanced_parenthesis(ns):
    assert_fails(ns, '(a2_i + a2_i',
                 'Unexpected end of expression.',
                 '            ^')


def test_unexpected_closing(ns):
    assert_fails(ns, '2 (a + a]',
                 "Expected ')' but found ']'.",
                 '        ^')


def test_unexpected_trailing(ns):
    assert_fails(ns, 'a) + 1',
                 "Unexpected trailing ')'.",
                 ' ^^^^^')


# ------------------------------------------------------------- powers

def test_nonscalar_exponent(ns):
    assert_fails(ns, '2^(a2_i + a2_i)',
                 'The exponent must have dimension zero.',
                 '  ^^^^^^^^^^^^^')


def test_invalid_exponent(ns):
    assert_fails(ns, '2^/',
                 "Expected a number, variable or parenthesized expression but found '/'.",
                 '  ^')


# ------------------------------------------------------------- functions

def test_unknown_function(ns):
    assert_fails(ns, 'f(a)',
                 "Unknown function 'f'.",
                 '^')


def test_not_callable(ns):
    assert_fails(ns, 'a2(a)',
                 "'a2' is not callable.",
                 '^^')


def test_wrong_generated_index_count():
    from nutils_tpu import mesh
    topo, geom = mesh.rectilinear([numpy.linspace(0, 1, 3)] * 2)
    ns = Namespace()
    ns.x = geom
    ns.define_for('x', gradient='∇', jacobians=('dV',))
    ns.u = 1.0
    assert_fails(ns, '∇_ij(u)',
                 "Expected 1 indices for the axes generated by '∇' but got 2.",
                 '^^^^')


# ------------------------------------------------------------- valid parses
# semantics matrix: the same expressions evaluated against numpy einsum

def _value(ns, expression):
    arr = expression @ ns
    return numpy.asarray(arr.eval({}))


def test_parse_unary_minus_precedence(ns):
    # -2^2 == -(2^2): https://en.wikipedia.org/wiki/Order_of_operations
    numpy.testing.assert_allclose(_value(ns, '-2^2'), -4.0)
    numpy.testing.assert_allclose(_value(ns, '2^-2'), 0.25)


def test_parse_transpose_alignment(ns):
    a23 = numpy.arange(6.0).reshape(2, 3) + 1
    a32 = numpy.arange(6.0).reshape(3, 2) + 1
    numpy.testing.assert_allclose(_value(ns, 'a23_ij + a32_ji'), a23 + a32.T)


def test_parse_trace(ns):
    a22 = numpy.arange(4.0).reshape(2, 2) + 1
    numpy.testing.assert_allclose(_value(ns, 'a22_ii'), numpy.trace(a22))


def test_parse_contraction(ns):
    a2 = numpy.arange(2.0) + 1
    a23 = numpy.arange(6.0).reshape(2, 3) + 1
    a3 = numpy.arange(3.0) + 1
    numpy.testing.assert_allclose(_value(ns, 'a2_i a23_ij a3_j'),
                                  numpy.einsum('i,ij,j', a2, a23, a3))


def test_parse_outer_product_order(ns):
    a2 = numpy.arange(2.0) + 1
    a3 = numpy.arange(3.0) + 1
    numpy.testing.assert_allclose(_value(ns, 'a2_i a3_j'), numpy.einsum('i,j->ij', a2, a3))
    # free index order is the order of first appearance
    numpy.testing.assert_allclose(_value(ns, 'a3_j a2_i'), numpy.einsum('j,i->ji', a2, a3).T.T,
                                  err_msg='order of first appearance')


def test_parse_fraction_scalar(ns):
    a2 = numpy.arange(2.0) + 1
    numpy.testing.assert_allclose(_value(ns, '2 a2_i / 4'), a2 / 2)


def test_parse_numeral_item(ns):
    a23 = numpy.arange(6.0).reshape(2, 3) + 1
    numpy.testing.assert_allclose(_value(ns, 'a23_0j'), a23[0])
    numpy.testing.assert_allclose(_value(ns, 'a23_i1'), a23[:, 1])


def test_parse_scope_reuse(ns):
    # indices inside parentheses live in their own scope
    a2 = numpy.arange(2.0) + 1
    v = _value(ns, 'a2_i (a2_j a2_j) a2_i')
    numpy.testing.assert_allclose(v, (a2 @ a2) ** 2)
