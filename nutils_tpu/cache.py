'''Disk memoization of expensive pure functions.

TPU-native counterpart of the reference's cache module (reference: cache.py):
``@cache.function`` hashes the function identity and its arguments and reuses
a pickled result from the cache directory when enabled.  Enable by setting
the ``NUTILS_TPU_CACHE`` environment variable to a directory, or with the
:func:`enable` context manager.  (The XLA compilation cache — the analogue of
the reference's compiled-evaluable cache — is configured separately in the
package __init__.)
'''

import contextlib
import functools
import hashlib
import os
import pickle

from .utils import _log as log

_cachedir = [os.environ.get('NUTILS_TPU_CACHE') or None]


@contextlib.contextmanager
def enable(directory):
    '''Enable disk caching within the context.'''
    old = _cachedir[0]
    _cachedir[0] = directory
    try:
        yield
    finally:
        _cachedir[0] = old


@contextlib.contextmanager
def disable():
    old = _cachedir[0]
    _cachedir[0] = None
    try:
        yield
    finally:
        _cachedir[0] = old


def _digest(func, args, kwargs):
    h = hashlib.sha1()
    h.update(f'{func.__module__}.{func.__qualname__}'.encode())
    try:
        payload = pickle.dumps((args, sorted(kwargs.items())), protocol=4)
    except Exception:
        return None
    h.update(payload)
    return h.hexdigest()


def function(func):
    '''Memoize ``func`` on disk when caching is enabled.  Arguments must be
    picklable; unpicklable calls fall through to a plain call.'''

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        cachedir = _cachedir[0]
        if not cachedir:
            return func(*args, **kwargs)
        key = _digest(func, args, kwargs)
        if key is None:
            return func(*args, **kwargs)
        path = os.path.join(cachedir, func.__qualname__ + '-' + key)
        if os.path.exists(path):
            try:
                with open(path, 'rb') as f:
                    value = pickle.load(f)
                log.info(f'cache hit: {func.__qualname__}')
                return value
            except Exception:
                pass
        value = func(*args, **kwargs)
        try:
            os.makedirs(cachedir, exist_ok=True)
            tmp = path + '.tmp'
            with open(tmp, 'wb') as f:
                pickle.dump(value, f, protocol=4)
            os.replace(tmp, path)
        except Exception:
            pass
        return value
    return wrapper
