from .status import JXLError, NotEnoughBytes, check
