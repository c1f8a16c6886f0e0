from . import io, ndimage, utils
