from . import state, history
