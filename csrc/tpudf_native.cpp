// tpudf native host runtime — IO staging kernels.
//
// TPU-native equivalent of the reference's host-side native tier
// (reference: cpp/src/io/utilities/datasource.cpp, io/text/multibyte_split.cu,
// io/comp/unsnap.cu, io/parquet rle_stream.cuh).  The device consumes flat
// buffers; these routines produce them at memcpy-like speed on the host so
// the HBM transfer is a single contiguous DMA:
//
//   - multibyte_split:  delimiter scan -> int64 offsets (text ingest)
//   - bitunpack32:      parquet bit-packed ints -> int32 (decode staging)
//   - snappy_decompress: raw snappy block format -> bytes (page decompress)
//   - rle_decode32:     parquet RLE/bit-packed hybrid runs -> int32
//
// Exposed via the CPython C API (no pybind11 in this image).  The Python
// wrapper (cudf_tpu/native.py) builds this lazily with setuptools and
// falls back to numpy implementations when no toolchain is present.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// multibyte_split: offsets of records separated by `delim` (like memchr
// loop; returns record START offsets plus total length sentinel)
// ---------------------------------------------------------------------
PyObject* multibyte_split(PyObject*, PyObject* args) {
  const char* buf;
  Py_ssize_t n;
  const char* delim;
  Py_ssize_t dlen;
  if (!PyArg_ParseTuple(args, "y#y#", &buf, &n, &delim, &dlen)) return nullptr;
  std::vector<int64_t> offsets;
  offsets.push_back(0);
  if (dlen == 1) {
    const char c = delim[0];
    const char* p = buf;
    const char* end = buf + n;
    while ((p = static_cast<const char*>(memchr(p, c, end - p))) != nullptr) {
      ++p;
      offsets.push_back(static_cast<int64_t>(p - buf));
    }
  } else if (dlen > 1) {
    for (Py_ssize_t i = 0; i + dlen <= n;) {
      if (memcmp(buf + i, delim, dlen) == 0) {
        i += dlen;
        offsets.push_back(static_cast<int64_t>(i));
      } else {
        ++i;
      }
    }
  }
  if (offsets.back() != n) offsets.push_back(n);
  PyObject* out = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(offsets.data()),
      static_cast<Py_ssize_t>(offsets.size() * sizeof(int64_t)));
  return out;
}

// ---------------------------------------------------------------------
// bitunpack32: unpack `count` little-endian bit-packed values of width
// `bit_width` (parquet style) into int32
// ---------------------------------------------------------------------
PyObject* bitunpack32(PyObject*, PyObject* args) {
  const char* buf;
  Py_ssize_t n;
  int bit_width;
  long long count;
  if (!PyArg_ParseTuple(args, "y#iL", &buf, &n, &bit_width, &count)) return nullptr;
  if (bit_width < 0 || bit_width > 32) {
    PyErr_SetString(PyExc_ValueError, "bit_width must be in [0, 32]");
    return nullptr;
  }
  std::vector<int32_t> out(static_cast<size_t>(count));
  const uint8_t* p = reinterpret_cast<const uint8_t*>(buf);
  uint64_t acc = 0;
  int nbits = 0;
  size_t byte = 0;
  const uint64_t mask = bit_width == 32 ? 0xFFFFFFFFull : ((1ull << bit_width) - 1);
  for (long long i = 0; i < count; ++i) {
    while (nbits < bit_width) {
      uint8_t b = byte < static_cast<size_t>(n) ? p[byte] : 0;
      acc |= static_cast<uint64_t>(b) << nbits;
      nbits += 8;
      ++byte;
    }
    out[static_cast<size_t>(i)] = static_cast<int32_t>(acc & mask);
    acc >>= bit_width;
    nbits -= bit_width;
  }
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   static_cast<Py_ssize_t>(out.size() * 4));
}

// ---------------------------------------------------------------------
// rle_decode32: parquet RLE/bit-packed hybrid (after the 4-byte length
// header).  Decodes exactly `count` values of width `bit_width`.
// ---------------------------------------------------------------------
PyObject* rle_decode32(PyObject*, PyObject* args) {
  const char* buf;
  Py_ssize_t n;
  int bit_width;
  long long count;
  if (!PyArg_ParseTuple(args, "y#iL", &buf, &n, &bit_width, &count)) return nullptr;
  std::vector<int32_t> out;
  out.reserve(static_cast<size_t>(count));
  const uint8_t* p = reinterpret_cast<const uint8_t*>(buf);
  size_t pos = 0;
  const int byte_width = (bit_width + 7) / 8;
  while (out.size() < static_cast<size_t>(count) && pos < static_cast<size_t>(n)) {
    // ULEB128 header
    uint64_t header = 0;
    int shift = 0;
    while (pos < static_cast<size_t>(n)) {
      uint8_t b = p[pos++];
      header |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) break;
      shift += 7;
    }
    if (header & 1) {
      // bit-packed run: (header >> 1) groups of 8 values
      uint64_t groups = header >> 1;
      uint64_t nvals = groups * 8;
      uint64_t acc = 0;
      int nbits = 0;
      const uint64_t mask = bit_width == 32 ? 0xFFFFFFFFull : ((1ull << bit_width) - 1);
      for (uint64_t i = 0; i < nvals && out.size() < static_cast<size_t>(count); ++i) {
        while (nbits < bit_width) {
          uint8_t b = pos < static_cast<size_t>(n) ? p[pos] : 0;
          ++pos;
          acc |= static_cast<uint64_t>(b) << nbits;
          nbits += 8;
        }
        out.push_back(static_cast<int32_t>(acc & mask));
        acc >>= bit_width;
        nbits -= bit_width;
      }
      // note: a partial trailing group still consumed whole bytes above
    } else {
      // RLE run: single value repeated (header >> 1) times
      uint64_t run = header >> 1;
      uint32_t v = 0;
      for (int b = 0; b < byte_width && pos < static_cast<size_t>(n); ++b) {
        v |= static_cast<uint32_t>(p[pos++]) << (8 * b);
      }
      for (uint64_t i = 0; i < run && out.size() < static_cast<size_t>(count); ++i) {
        out.push_back(static_cast<int32_t>(v));
      }
    }
  }
  out.resize(static_cast<size_t>(count));
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   static_cast<Py_ssize_t>(out.size() * 4));
}

// ---------------------------------------------------------------------
// snappy_decompress: raw snappy format (preamble varint uncompressed len,
// then literal/copy tags) — the host-tier replacement for unsnap.cu
// ---------------------------------------------------------------------
PyObject* snappy_decompress(PyObject*, PyObject* args) {
  const char* buf;
  Py_ssize_t n;
  if (!PyArg_ParseTuple(args, "y#", &buf, &n)) return nullptr;
  const uint8_t* p = reinterpret_cast<const uint8_t*>(buf);
  size_t pos = 0;
  // varint uncompressed length
  uint64_t ulen = 0;
  int shift = 0;
  while (pos < static_cast<size_t>(n)) {
    uint8_t b = p[pos++];
    ulen |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  std::vector<uint8_t> out;
  out.reserve(ulen);
  while (pos < static_cast<size_t>(n) && out.size() < ulen) {
    uint8_t tag = p[pos++];
    uint32_t type = tag & 0x3;
    if (type == 0) {  // literal
      uint32_t len = (tag >> 2) + 1;
      if (len > 60) {
        uint32_t nb = len - 60;
        len = 0;
        for (uint32_t i = 0; i < nb; ++i) len |= static_cast<uint32_t>(p[pos++]) << (8 * i);
        len += 1;
      }
      if (pos + len > static_cast<size_t>(n)) {
        PyErr_SetString(PyExc_ValueError, "snappy: literal overruns input");
        return nullptr;
      }
      out.insert(out.end(), p + pos, p + pos + len);
      pos += len;
    } else {
      uint32_t len, offset;
      if (type == 1) {  // copy with 1-byte offset
        len = ((tag >> 2) & 0x7) + 4;
        offset = (static_cast<uint32_t>(tag >> 5) << 8) | p[pos++];
      } else if (type == 2) {  // 2-byte offset
        len = (tag >> 2) + 1;
        offset = static_cast<uint32_t>(p[pos]) | (static_cast<uint32_t>(p[pos + 1]) << 8);
        pos += 2;
      } else {  // 4-byte offset
        len = (tag >> 2) + 1;
        offset = static_cast<uint32_t>(p[pos]) | (static_cast<uint32_t>(p[pos + 1]) << 8) |
                 (static_cast<uint32_t>(p[pos + 2]) << 16) |
                 (static_cast<uint32_t>(p[pos + 3]) << 24);
        pos += 4;
      }
      if (offset == 0 || offset > out.size()) {
        PyErr_SetString(PyExc_ValueError, "snappy: bad copy offset");
        return nullptr;
      }
      size_t src = out.size() - offset;
      for (uint32_t i = 0; i < len; ++i) out.push_back(out[src + i]);  // may overlap
    }
  }
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   static_cast<Py_ssize_t>(out.size()));
}

// ---------------------------------------------------------------------
// snappy_compress: greedy hash-table LZ77 over 64KB fragments (the
// snap.cu role at the host tier).  Emits literals and 2-byte-offset
// copies only — every standard decoder (including snappy_decompress
// above) accepts the subset.
// ---------------------------------------------------------------------
void emit_varint(std::vector<uint8_t>& out, uint64_t v) {
  while (v >= 0x80) {
    out.push_back(static_cast<uint8_t>(v) | 0x80);
    v >>= 7;
  }
  out.push_back(static_cast<uint8_t>(v));
}

void emit_literal(std::vector<uint8_t>& out, const uint8_t* p, uint32_t len) {
  uint32_t l = len - 1;
  if (l < 60) {
    out.push_back(static_cast<uint8_t>(l << 2));
  } else if (l < (1u << 8)) {
    out.push_back(60 << 2);
    out.push_back(static_cast<uint8_t>(l));
  } else {
    out.push_back(61 << 2);
    out.push_back(static_cast<uint8_t>(l));
    out.push_back(static_cast<uint8_t>(l >> 8));
  }
  out.insert(out.end(), p, p + len);
}

void emit_copy(std::vector<uint8_t>& out, uint32_t offset, uint32_t len) {
  // split long matches into <=64-byte 2-byte-offset copies
  while (len > 0) {
    uint32_t l = len < 64 ? len : 64;
    if (l < 4) {  // tail shorter than min copy: only reachable if caller
      l = len;    // guaranteed len >= 4 per fragment; defensive clamp
    }
    out.push_back(static_cast<uint8_t>(((l - 1) << 2) | 2));
    out.push_back(static_cast<uint8_t>(offset));
    out.push_back(static_cast<uint8_t>(offset >> 8));
    len -= l;
  }
}

PyObject* snappy_compress(PyObject*, PyObject* args) {
  const char* buf;
  Py_ssize_t n;
  if (!PyArg_ParseTuple(args, "y#", &buf, &n)) return nullptr;
  const uint8_t* in = reinterpret_cast<const uint8_t*>(buf);
  std::vector<uint8_t> out;
  out.reserve(static_cast<size_t>(n) / 2 + 16);
  emit_varint(out, static_cast<uint64_t>(n));
  constexpr size_t kFragment = 1 << 16;        // offsets fit 2 bytes
  constexpr uint32_t kHashBits = 14;
  std::vector<int32_t> table(1u << kHashBits);
  for (size_t base = 0; base < static_cast<size_t>(n); base += kFragment) {
    size_t end = base + kFragment;
    if (end > static_cast<size_t>(n)) end = static_cast<size_t>(n);
    size_t len = end - base;
    const uint8_t* frag = in + base;
    if (len < 16) {
      emit_literal(out, frag, static_cast<uint32_t>(len));
      continue;
    }
    std::fill(table.begin(), table.end(), -1);
    size_t i = 0, lit_start = 0;
    size_t limit = len - 4;
    while (i <= limit) {
      uint32_t w;
      std::memcpy(&w, frag + i, 4);
      uint32_t h = (w * 0x1e35a7bdu) >> (32 - kHashBits);
      int32_t cand = table[h];
      table[h] = static_cast<int32_t>(i);
      uint32_t cw;
      if (cand >= 0) {
        std::memcpy(&cw, frag + cand, 4);
        if (cw == w) {
          // extend the match
          size_t m = 4;
          while (i + m < len && frag[cand + m] == frag[i + m]) ++m;
          if (i > lit_start)
            emit_literal(out, frag + lit_start,
                         static_cast<uint32_t>(i - lit_start));
          emit_copy(out, static_cast<uint32_t>(i - cand),
                    static_cast<uint32_t>(m));
          i += m;
          lit_start = i;
          continue;
        }
      }
      ++i;
    }
    if (lit_start < len)
      emit_literal(out, frag + lit_start, static_cast<uint32_t>(len - lit_start));
  }
  if (n == 0) { /* header already written: varint 0 */ }
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   static_cast<Py_ssize_t>(out.size()));
}

// ---------------------------------------------------------------------
// avro_decode_block: decode one Avro container block (already
// decompressed) of `count` records into columnar buffers — the host-tier
// role of the reference's avro_gpu.cu (rows are varint-delimited and
// inherently sequential; blocks are the parallel unit there and the
// contiguous-DMA staging unit here).
//
// desc: int32 triples per field (kind, null_branch, extra):
//   kind: 0 boolean, 1 int, 2 long, 3 float, 4 double, 5 bytes,
//         6 string, 7 enum(int index), 8 null-typed field,
//         9 fixed (extra = byte size)
//   null_branch: union [null,T]/[T,null] null index, or -1 (required)
// Returns a tuple per field:
//   fixed-width kinds -> (values_bytes, validity_bytes)
//   bytes/string/fixed -> (offsets_int64_bytes, chars_bytes, validity_bytes)
// ---------------------------------------------------------------------
namespace avro {

struct Cursor {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;
  bool ok = true;

  uint64_t raw_varint() {
    uint64_t v = 0;
    int shift = 0;
    while (pos < n) {
      uint8_t b = p[pos++];
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
      if (shift > 63) break;
    }
    ok = false;
    return 0;
  }

  int64_t zigzag() {
    uint64_t u = raw_varint();
    return static_cast<int64_t>((u >> 1) ^ (~(u & 1) + 1));
  }

  bool take(size_t len, const uint8_t** out) {
    if (pos + len > n) {
      ok = false;
      return false;
    }
    *out = p + pos;
    pos += len;
    return true;
  }
};

struct FieldOut {
  int kind, null_branch, extra;
  std::vector<uint8_t> values;   // fixed-width payload (elem-size packed)
  std::vector<int64_t> offsets;  // bytes/string/fixed
  std::vector<uint8_t> chars;
  std::vector<uint8_t> valid;
};

}  // namespace avro

PyObject* avro_decode_block(PyObject*, PyObject* args) {
  const char* buf;
  Py_ssize_t n;
  long long count;
  const char* descb;
  Py_ssize_t desclen;
  if (!PyArg_ParseTuple(args, "y#Ly#", &buf, &n, &count, &descb, &desclen))
    return nullptr;
  if (desclen % 12 != 0) {
    PyErr_SetString(PyExc_ValueError, "avro: desc must be int32 triples");
    return nullptr;
  }
  const int nf = static_cast<int>(desclen / 12);
  const int32_t* d = reinterpret_cast<const int32_t*>(descb);
  std::vector<avro::FieldOut> fields(static_cast<size_t>(nf));
  for (int f = 0; f < nf; ++f) {
    auto& fo = fields[static_cast<size_t>(f)];
    fo.kind = d[3 * f];
    fo.null_branch = d[3 * f + 1];
    fo.extra = d[3 * f + 2];
    fo.valid.reserve(static_cast<size_t>(count));
    if (fo.kind == 5 || fo.kind == 6 || fo.kind == 9) {
      fo.offsets.reserve(static_cast<size_t>(count) + 1);
      fo.offsets.push_back(0);
    } else {
      const int esz = (fo.kind == 0) ? 1 : (fo.kind == 1 || fo.kind == 7 || fo.kind == 3) ? 4 : 8;
      fo.values.reserve(static_cast<size_t>(count) * static_cast<size_t>(esz));
    }
  }
  avro::Cursor cur{reinterpret_cast<const uint8_t*>(buf),
                   static_cast<size_t>(n)};
  auto push = [](std::vector<uint8_t>& v, const void* src, size_t len) {
    const uint8_t* s = static_cast<const uint8_t*>(src);
    v.insert(v.end(), s, s + len);
  };
  for (long long row = 0; row < count && cur.ok; ++row) {
    for (int f = 0; f < nf && cur.ok; ++f) {
      auto& fo = fields[static_cast<size_t>(f)];
      bool isnull = (fo.kind == 8);
      if (fo.null_branch >= 0) {
        int64_t br = cur.zigzag();
        if (br == fo.null_branch) isnull = true;
        else if (br != (fo.null_branch ^ 1)) { cur.ok = false; break; }
      }
      fo.valid.push_back(isnull ? 0 : 1);
      switch (fo.kind) {
        case 0: {  // boolean: one byte 0/1
          uint8_t v = 0;
          if (!isnull) {
            const uint8_t* s;
            if (cur.take(1, &s)) v = *s;
          }
          fo.values.push_back(v);
          break;
        }
        case 1:
        case 7: {  // int / enum index
          int32_t v = isnull ? 0 : static_cast<int32_t>(cur.zigzag());
          push(fo.values, &v, 4);
          break;
        }
        case 2: {  // long
          int64_t v = isnull ? 0 : cur.zigzag();
          push(fo.values, &v, 8);
          break;
        }
        case 3: {  // float (4 bytes LE)
          const uint8_t* s = nullptr;
          uint8_t zero[4] = {0, 0, 0, 0};
          if (!isnull) cur.take(4, &s);
          push(fo.values, s ? s : zero, 4);
          break;
        }
        case 4: {  // double (8 bytes LE)
          const uint8_t* s = nullptr;
          uint8_t zero[8] = {0};
          if (!isnull) cur.take(8, &s);
          push(fo.values, s ? s : zero, 8);
          break;
        }
        case 5:
        case 6: {  // bytes / string: zigzag length + payload
          if (!isnull) {
            int64_t len = cur.zigzag();
            const uint8_t* s;
            if (len < 0 || !cur.take(static_cast<size_t>(len), &s)) {
              cur.ok = false;
              break;
            }
            push(fo.chars, s, static_cast<size_t>(len));
          }
          fo.offsets.push_back(static_cast<int64_t>(fo.chars.size()));
          break;
        }
        case 8:  // null-typed field: zero bytes on the wire
          break;
        case 9: {  // fixed(extra)
          if (!isnull) {
            const uint8_t* s;
            if (!cur.take(static_cast<size_t>(fo.extra), &s)) break;
            push(fo.chars, s, static_cast<size_t>(fo.extra));
          }
          fo.offsets.push_back(static_cast<int64_t>(fo.chars.size()));
          break;
        }
        default:
          cur.ok = false;
      }
    }
  }
  if (!cur.ok) {
    PyErr_SetString(PyExc_ValueError, "avro: malformed block data");
    return nullptr;
  }
  PyObject* out = PyTuple_New(nf);
  if (!out) return nullptr;
  for (int f = 0; f < nf; ++f) {
    auto& fo = fields[static_cast<size_t>(f)];
    PyObject* vb = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(fo.valid.data()),
        static_cast<Py_ssize_t>(fo.valid.size()));
    PyObject* entry;
    if (fo.kind == 5 || fo.kind == 6 || fo.kind == 9) {
      // "N" steals the new references (no leak, unlike PyTuple_Pack)
      entry = Py_BuildValue(
          "(NNN)",
          PyBytes_FromStringAndSize(
              reinterpret_cast<const char*>(fo.offsets.data()),
              static_cast<Py_ssize_t>(fo.offsets.size() * 8)),
          PyBytes_FromStringAndSize(
              reinterpret_cast<const char*>(fo.chars.data()),
              static_cast<Py_ssize_t>(fo.chars.size())),
          vb);
    } else {
      entry = Py_BuildValue(
          "(NN)",
          PyBytes_FromStringAndSize(
              reinterpret_cast<const char*>(fo.values.data()),
              static_cast<Py_ssize_t>(fo.values.size())),
          vb);
    }
    PyTuple_SET_ITEM(out, f, entry);
  }
  return out;
}

PyMethodDef methods[] = {
    {"multibyte_split", multibyte_split, METH_VARARGS,
     "split buffer by delimiter -> int64 record offsets (as bytes)"},
    {"bitunpack32", bitunpack32, METH_VARARGS,
     "unpack bit-packed little-endian ints -> int32 buffer"},
    {"rle_decode32", rle_decode32, METH_VARARGS,
     "decode parquet RLE/bit-packed hybrid -> int32 buffer"},
    {"snappy_decompress", snappy_decompress, METH_VARARGS,
     "decompress raw snappy block -> bytes"},
    {"snappy_compress", snappy_compress, METH_VARARGS,
     "compress bytes -> raw snappy block"},
    {"avro_decode_block", avro_decode_block, METH_VARARGS,
     "decode an avro block -> per-field columnar buffers"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_tpudf_native", "tpudf native host IO kernels",
    -1, methods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__tpudf_native(void) { return PyModule_Create(&moduledef); }
