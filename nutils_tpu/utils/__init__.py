'''Foundation layer: configuration, numeric helpers, logging, misc utilities.'''

from . import config, numeric, _log
