'''Legacy v1 expression namespace — deprecated compatibility shim.

The reference keeps its original string DSL alive as ``expression_v1``
alongside the current ``expression_v2`` and marks it deprecated (reference:
expression_v1.py:1-20).  This module provides the same deprecation surface:
a ``Namespace`` that accepts the v2 syntax (the v1-only constructs — implicit
geometry-bound gradients ``u_,i``, the ``n_i`` shorthand and ``d:``-style
argument annotations — were already removed from the reference's examples)
and warns on use.  New code should import :mod:`nutils_tpu.expression`.
'''

import warnings as _warnings

from . import expression as _expression
from .warnings import NutilsDeprecationWarning


class Namespace(_expression.Namespace):
    '''Deprecated: use :class:`nutils_tpu.expression.Namespace`.'''

    def __init__(self, *args, **kwargs):
        _warnings.warn('expression_v1.Namespace is deprecated; use the '
                       'expression (v2) Namespace instead',
                       NutilsDeprecationWarning, stacklevel=2)
        super().__init__(*args, **kwargs)


def __getattr__(name):
    # forward everything else to the v2 module, with a deprecation warning
    attr = getattr(_expression, name)
    _warnings.warn(f'expression_v1.{name} is deprecated; import it from '
                   'nutils_tpu.expression instead', NutilsDeprecationWarning, stacklevel=2)
    return attr
