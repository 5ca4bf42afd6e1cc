"""Oracle access to the read-only torch reference at /root/reference.

Thin delegate over vdn.eval.reference_oracle (shared with the
weight-parity runner vdn.cli.parity_run): tests EXECUTE the reference to
generate parity expectations — vdn never imports implementation code
from it.
"""

from vdn.eval.reference_oracle import (  # noqa: F401
    add_reference_to_path, state_dict_numpy)
