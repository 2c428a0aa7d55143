"""Minimal appdirs shim for the reference nutils cache module."""

import os
import tempfile


def user_cache_dir(appname, appauthor=None):
    return os.path.join(tempfile.gettempdir(), 'refshim_cache', appname)
