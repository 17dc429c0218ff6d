"""Python 3.6 .pyc structure extractor + wordcode disassembler (stdlib
only).  Used to reconstruct the reference's bytecode-only modules
(model/net/__pycache__/{din,dien,dien_utils,dien_rnn}.cpython-36.pyc)
for models/baselines.py — CPython 3.12 cannot unmarshal 3.6 code objects.

Usage:
    python scripts/pyc36_dis.py <file.pyc>            # nested code tree
    python scripts/pyc36_dis.py <file.pyc> <codename> # disassemble one
"""
import struct
import sys


class Code:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __repr__(self):
        return f"<code {self.name} args={self.argcount}>"


class Reader:
    def __init__(self, data):
        self.d = data
        self.p = 0
        self.refs = []

    def rb(self, n):
        b = self.d[self.p:self.p + n]
        self.p += n
        return b

    def u32(self):
        return struct.unpack("<I", self.rb(4))[0]

    def i32(self):
        return struct.unpack("<i", self.rb(4))[0]

    def u8(self):
        v = self.d[self.p]
        self.p += 1
        return v

    def read(self):
        t = self.u8()
        flag_ref = bool(t & 0x80)
        t = chr(t & 0x7F)
        idx = None
        if flag_ref:
            idx = len(self.refs)
            self.refs.append(None)

        def keep(v):
            if flag_ref:
                self.refs[idx] = v
            return v

        if t == '0':
            return keep(None)
        if t == 'N':
            return keep(None)
        if t == 'F':
            return keep(False)
        if t == 'T':
            return keep(True)
        if t == 'S':
            return keep(StopIteration)
        if t == '.':
            return keep(Ellipsis)
        if t == 'i':
            return keep(self.i32())
        if t == 'g':
            return keep(struct.unpack("<d", self.rb(8))[0])
        if t == 'y':
            return keep(complex(*struct.unpack("<dd", self.rb(16))))
        if t == 'l':
            n = self.i32()
            sign = -1 if n < 0 else 1
            n = abs(n)
            val = 0
            for i in range(n):
                val |= struct.unpack("<H", self.rb(2))[0] << (15 * i)
            return keep(sign * val)
        if t == 's':
            n = self.u32()
            return keep(self.rb(n))
        if t in 'tu':  # interned / unicode
            n = self.u32()
            return keep(self.rb(n).decode("utf8", "replace"))
        if t in 'aA':  # ascii (interned)
            n = self.u32()
            return keep(self.rb(n).decode("ascii", "replace"))
        if t in 'zZ':  # short ascii
            n = self.u8()
            return keep(self.rb(n).decode("ascii", "replace"))
        if t == '(':
            n = self.u32()
            out = []
            keep(out)  # reserve before children (self-ref safe-ish)
            for _ in range(n):
                out.append(self.read())
            return keep(tuple(out)) if not flag_ref else self._retuple(idx, out)
        if t == ')':
            n = self.u8()
            out = []
            for _ in range(n):
                out.append(self.read())
            return keep(tuple(out)) if not flag_ref else self._retuple(idx, out)
        if t == '[':
            n = self.u32()
            out = []
            keep(out)
            for _ in range(n):
                out.append(self.read())
            return out
        if t == '{':
            out = {}
            keep(out)
            while True:
                k = self.read()
                if k is None:
                    break
                out[k] = self.read()
            return out
        if t in '<>':
            n = self.u32()
            out = set()
            keep(out)
            for _ in range(n):
                out.add(self.read())
            return frozenset(out) if t == '>' else out
        if t == 'r':
            return self.refs[self.u32()]
        if t == 'R':
            return self.refs[self.u32()]
        if t == 'c':
            c = Code()
            keep(c)
            c.argcount = self.u32()
            c.kwonlyargcount = self.u32()
            c.nlocals = self.u32()
            c.stacksize = self.u32()
            c.flags = self.u32()
            c.code = self.read()
            c.consts = self.read()
            c.names = self.read()
            c.varnames = self.read()
            c.freevars = self.read()
            c.cellvars = self.read()
            c.filename = self.read()
            c.name = self.read()
            c.firstlineno = self.u32()
            c.lnotab = self.read()
            return c
        raise ValueError(f"unknown marshal type {t!r} at {self.p}")

    def _retuple(self, idx, out):
        v = tuple(out)
        self.refs[idx] = v
        return v


def load_pyc(path):
    data = open(path, "rb").read()
    return Reader(data[12:]).read()


def walk(code, depth=0):
    print("  " * depth + f"code {code.name!r} line {code.firstlineno} "
          f"args={code.varnames[:code.argcount] if code.varnames else ()}")
    print("  " * depth + f"  varnames={code.varnames}")
    print("  " * depth + f"  names={code.names}")
    sc = [c for c in code.consts if isinstance(c, Code)]
    nonc = [c for c in code.consts if not isinstance(c, Code)]
    print("  " * depth + f"  consts={nonc}")
    for c in sc:
        walk(c, depth + 1)


if __name__ == "__main__":
    walk(load_pyc(sys.argv[1]))

# ---- minimal 3.6 wordcode disassembler ----
OPNAMES = {
    1: "POP_TOP", 2: "ROT_TWO", 3: "ROT_THREE", 4: "DUP_TOP",
    5: "DUP_TOP_TWO", 9: "NOP", 10: "UNARY_POSITIVE", 11: "UNARY_NEGATIVE",
    12: "UNARY_NOT", 15: "UNARY_INVERT", 16: "BINARY_MATRIX_MULTIPLY",
    19: "BINARY_POWER", 20: "BINARY_MULTIPLY", 22: "BINARY_MODULO",
    23: "BINARY_ADD", 24: "BINARY_SUBTRACT", 25: "BINARY_SUBSCR",
    26: "BINARY_FLOOR_DIVIDE", 27: "BINARY_TRUE_DIVIDE",
    55: "INPLACE_ADD", 56: "INPLACE_SUBTRACT", 57: "INPLACE_MULTIPLY",
    59: "INPLACE_MODULO", 60: "STORE_SUBSCR", 61: "DELETE_SUBSCR",
    62: "BINARY_LSHIFT", 63: "BINARY_RSHIFT", 64: "BINARY_AND",
    65: "BINARY_XOR", 66: "BINARY_OR", 68: "GET_ITER",
    72: "YIELD_FROM", 80: "BREAK_LOOP", 83: "RETURN_VALUE",
    84: "IMPORT_STAR", 86: "YIELD_VALUE", 87: "POP_BLOCK",
    88: "END_FINALLY", 89: "POP_EXCEPT",
    90: "STORE_NAME", 91: "DELETE_NAME", 92: "UNPACK_SEQUENCE",
    93: "FOR_ITER", 94: "UNPACK_EX", 95: "STORE_ATTR",
    97: "STORE_GLOBAL", 100: "LOAD_CONST", 101: "LOAD_NAME",
    102: "BUILD_TUPLE", 103: "BUILD_LIST", 104: "BUILD_SET",
    105: "BUILD_MAP", 106: "LOAD_ATTR", 107: "COMPARE_OP",
    108: "IMPORT_NAME", 109: "IMPORT_FROM", 110: "JUMP_FORWARD",
    111: "JUMP_IF_FALSE_OR_POP", 112: "JUMP_IF_TRUE_OR_POP",
    113: "JUMP_ABSOLUTE", 114: "POP_JUMP_IF_FALSE",
    115: "POP_JUMP_IF_TRUE", 116: "LOAD_GLOBAL", 119: "CONTINUE_LOOP",
    120: "SETUP_LOOP", 121: "SETUP_EXCEPT", 122: "SETUP_FINALLY",
    124: "LOAD_FAST", 125: "STORE_FAST", 126: "DELETE_FAST",
    130: "RAISE_VARARGS", 131: "CALL_FUNCTION", 132: "MAKE_FUNCTION",
    133: "BUILD_SLICE", 135: "LOAD_CLOSURE", 136: "LOAD_DEREF",
    137: "STORE_DEREF", 141: "CALL_FUNCTION_KW", 142: "CALL_FUNCTION_EX",
    143: "SETUP_WITH", 144: "EXTENDED_ARG", 145: "LIST_APPEND",
    146: "SET_ADD", 147: "MAP_ADD", 148: "LOAD_CLASSDEREF",
    155: "FORMAT_VALUE", 156: "BUILD_CONST_KEY_MAP", 157: "BUILD_STRING",
}
CMPS = ('<', '<=', '==', '!=', '>', '>=', 'in', 'not in', 'is', 'is not',
        'exc match', 'BAD')


def dis36(code):
    b = code.code
    ext = 0
    for i in range(0, len(b), 2):
        op, arg = b[i], b[i + 1]
        arg |= ext
        ext = 0
        name = OPNAMES.get(op, f"OP_{op}")
        if name == "EXTENDED_ARG":
            ext = arg << 8
            continue
        detail = ""
        try:
            if name in ("LOAD_CONST",):
                c = code.consts[arg]
                detail = f"<code {c.name}>" if isinstance(c, Code) else repr(c)
            elif name in ("LOAD_NAME", "LOAD_GLOBAL", "LOAD_ATTR",
                          "STORE_NAME", "STORE_ATTR", "IMPORT_NAME",
                          "IMPORT_FROM", "STORE_GLOBAL"):
                detail = code.names[arg]
            elif name in ("LOAD_FAST", "STORE_FAST", "DELETE_FAST"):
                detail = code.varnames[arg]
            elif name == "COMPARE_OP":
                detail = CMPS[arg]
            elif op >= 90:
                detail = str(arg)
        except Exception:
            detail = f"?{arg}"
        print(f"{i:5d} {name:26s} {detail}")


def find_code(code, name):
    if code.name == name:
        return code
    for c in code.consts:
        if isinstance(c, Code):
            r = find_code(c, name)
            if r:
                return r
    return None


if __name__ == "__main__" and len(sys.argv) > 2:
    c = find_code(load_pyc(sys.argv[1]), sys.argv[2])
    dis36(c)
