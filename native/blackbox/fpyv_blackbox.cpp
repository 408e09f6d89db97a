// Native Betaflight/iNav blackbox (.BBL) decoder for fpyv_tpu.
//
// The reference reads blackbox logs through the Python `orangebox` package
// (src/utils/log_reader.py:6-20) as real-flight ground truth for tuning.
// That package is an optional dependency; this is a from-scratch native
// decoder of the blackbox v2 binary format (headers, I/P main frames,
// S slow frames, E events, multi-log files), exposed as a small C ABI
// consumed from Python via ctypes (fpyv_tpu/io/blackbox_native.py).
//
// Format reference: the public Cleanflight/Betaflight blackbox
// specification (docs/development/Blackbox Internals.md) — field name /
// signedness / predictor / encoding header quadruples, variable-byte and
// tag-packed integer encodings, per-field prediction against previous
// frames.
//
// Build: g++ -O2 -shared -fPIC fpyv_blackbox.cpp -o libfpyv_blackbox.so
// (done on demand by fpyv_tpu.io.blackbox_native.build_blackbox_lib)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Encodings / predictors (blackbox spec numbering)
// ---------------------------------------------------------------------------

enum Encoding {
  ENC_SIGNED_VB = 0,
  ENC_UNSIGNED_VB = 1,
  ENC_NEG_14BIT = 3,
  ENC_TAG8_8SVB = 6,
  ENC_TAG2_3S32 = 7,
  ENC_TAG8_4S16 = 8,
  ENC_NULL = 9,
};

enum Predictor {
  PRED_0 = 0,
  PRED_PREVIOUS = 1,
  PRED_STRAIGHT_LINE = 2,
  PRED_AVERAGE_2 = 3,
  PRED_MINTHROTTLE = 4,
  PRED_MOTOR_0 = 5,
  PRED_INCREMENT = 6,
  PRED_1500 = 8,
  PRED_VBATREF = 9,
};

struct FieldDef {
  std::string name;
  int signedness = 0;
  int ipredictor = 0;
  int iencoding = 0;
  int ppredictor = 0;
  int pencoding = 0;
};

struct Stream {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;
  bool eof = false;

  int byte() {
    if (pos >= size) {
      eof = true;
      return 0;
    }
    return data[pos++];
  }
  int peek() const { return pos < size ? data[pos] : -1; }
};

int64_t sign_extend(uint32_t v, int bits) {
  uint32_t m = 1u << (bits - 1);
  return (int64_t)(int32_t)((v ^ m) - m);
}

uint32_t read_unsigned_vb(Stream& s) {
  uint32_t v = 0;
  for (int shift = 0; shift < 35; shift += 7) {
    int b = s.byte();
    v |= (uint32_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
  }
  return v;
}

int64_t zigzag(uint32_t v) { return (int64_t)(int32_t)((v >> 1) ^ -(int32_t)(v & 1)); }

int64_t read_signed_vb(Stream& s) { return zigzag(read_unsigned_vb(s)); }

// ---------------------------------------------------------------------------
// Log (one log of a possibly multi-log file)
// ---------------------------------------------------------------------------

struct Log {
  std::vector<FieldDef> ifields;  // main-frame fields (I/P share names)
  std::vector<FieldDef> sfields;  // slow-frame fields
  std::vector<FieldDef> gfields;  // GPS frames (decoded for sync, not emitted)
  std::vector<FieldDef> hfields;  // GPS home frames
  std::map<std::string, std::string> headers;
  int64_t minthrottle = 1150;
  int64_t vbatref = 4095;
  // decoded main frames (row-major), each row = ifields then sfields values
  std::vector<int64_t> rows;
  int64_t num_frames = 0;
  std::string error;
};

std::vector<std::string> split_csv(const std::string& s) {
  std::vector<std::string> out;
  std::string cur;
  for (char c : s) {
    if (c == ',') {
      out.push_back(cur);
      cur.clear();
    } else {
      cur += c;
    }
  }
  out.push_back(cur);
  return out;
}

void assign_field_column(std::vector<FieldDef>& fields, const std::string& what,
                         const std::string& value) {
  std::vector<std::string> parts = split_csv(value);
  if (fields.size() < parts.size()) fields.resize(parts.size());
  for (size_t i = 0; i < parts.size(); i++) {
    if (what == "name")
      fields[i].name = parts[i];
    else if (what == "signed")
      fields[i].signedness = atoi(parts[i].c_str());
    else if (what == "predictor")
      fields[i].ipredictor = atoi(parts[i].c_str());
    else if (what == "encoding")
      fields[i].iencoding = atoi(parts[i].c_str());
    else if (what == "ppredictor")
      fields[i].ppredictor = atoi(parts[i].c_str());
    else if (what == "pencoding")
      fields[i].pencoding = atoi(parts[i].c_str());
  }
}

// Parse "H name:value" header lines starting at s.pos; stops at the first
// byte that does not open a header line.
void parse_headers(Stream& s, Log& log) {
  while (s.peek() == 'H') {
    size_t save = s.pos;
    s.byte();  // 'H'
    if (s.byte() != ' ') {  // not a header line — a data frame type 'H'
      s.pos = save;
      return;
    }
    std::string line;
    while (!s.eof) {
      int c = s.byte();
      if (c == '\n') break;
      line += (char)c;
    }
    size_t colon = line.find(':');
    if (colon == std::string::npos) continue;
    std::string key = line.substr(0, colon);
    std::string value = line.substr(colon + 1);
    log.headers[key] = value;

    // "Field X name/signed/predictor/encoding"
    if (key.rfind("Field ", 0) == 0 && key.size() > 8) {
      char frame = key[6];
      std::string what = key.substr(8);
      std::vector<FieldDef>* fields = nullptr;
      bool pframe = false;
      if (frame == 'I') fields = &log.ifields;
      else if (frame == 'P') { fields = &log.ifields; pframe = true; }
      else if (frame == 'S') fields = &log.sfields;
      else if (frame == 'G') fields = &log.gfields;
      else if (frame == 'H') fields = &log.hfields;
      if (fields) {
        if (pframe && what == "predictor") what = "ppredictor";
        if (pframe && what == "encoding") what = "pencoding";
        assign_field_column(*fields, what, value);
      }
    } else if (key == "minthrottle") {
      log.minthrottle = atoll(value.c_str());
    } else if (key == "vbatref") {
      log.vbatref = atoll(value.c_str());
    }
  }
}

// ---------------------------------------------------------------------------
// Frame decoding
// ---------------------------------------------------------------------------

struct Decoder {
  Stream& s;
  Log& log;
  std::vector<int64_t> prev;       // previous main frame
  std::vector<int64_t> prev2;      // the one before
  std::vector<int64_t> slow;       // latest slow-frame values
  bool have_prev = false;
  bool have_prev2 = false;

  Decoder(Stream& stream, Log& l) : s(stream), log(l) {
    prev.assign(log.ifields.size(), 0);
    prev2.assign(log.ifields.size(), 0);
    slow.assign(log.sfields.size(), 0);
  }

  // Decode the raw (pre-prediction) values of one frame with the given
  // encodings. Group encodings (TAG8_8SVB, TAG2_3S32, TAG8_4S16) consume
  // several consecutive fields sharing the encoding.
  void decode_raw(const std::vector<FieldDef>& fields, bool pframe,
                  std::vector<int64_t>& out) {
    out.assign(fields.size(), 0);
    size_t i = 0;
    while (i < fields.size() && !s.eof) {
      int enc = pframe ? fields[i].pencoding : fields[i].iencoding;
      switch (enc) {
        case ENC_SIGNED_VB:
          out[i++] = read_signed_vb(s);
          break;
        case ENC_UNSIGNED_VB:
          out[i++] = (int64_t)read_unsigned_vb(s);
          break;
        case ENC_NEG_14BIT:
          out[i++] = -sign_extend(read_unsigned_vb(s), 14);
          break;
        case ENC_NULL:
          out[i++] = 0;
          break;
        case ENC_TAG8_8SVB: {
          // up to 8 consecutive fields with this encoding share one tag byte
          size_t n = 0;
          while (i + n < fields.size() && n < 8 &&
                 (pframe ? fields[i + n].pencoding : fields[i + n].iencoding) ==
                     ENC_TAG8_8SVB)
            n++;
          if (n == 1) {
            out[i++] = read_signed_vb(s);  // single field: no tag byte
            break;
          }
          int tag = s.byte();
          for (size_t k = 0; k < n; k++, tag >>= 1)
            out[i + k] = (tag & 1) ? read_signed_vb(s) : 0;
          i += n;
          break;
        }
        case ENC_TAG2_3S32: {
          int64_t v[3] = {0, 0, 0};
          int lead = s.byte();
          switch (lead >> 6) {
            case 0:  // three 2-bit fields in the lead byte
              v[0] = sign_extend((lead >> 4) & 3, 2);
              v[1] = sign_extend((lead >> 2) & 3, 2);
              v[2] = sign_extend(lead & 3, 2);
              break;
            case 1: {  // three 4-bit fields
              v[0] = sign_extend(lead & 0x0F, 4);
              int b = s.byte();
              v[1] = sign_extend((b >> 4) & 0x0F, 4);
              v[2] = sign_extend(b & 0x0F, 4);
              break;
            }
            case 2: {  // three 6-bit fields, one per byte
              v[0] = sign_extend(lead & 0x3F, 6);
              v[1] = sign_extend(s.byte() & 0x3F, 6);
              v[2] = sign_extend(s.byte() & 0x3F, 6);
              break;
            }
            case 3:  // 8/16/24/32-bit little-endian, 2 selector bits each
              for (int k = 0; k < 3; k++, lead >>= 2) {
                int nbytes = (lead & 3) + 1;
                uint32_t raw = 0;
                for (int b = 0; b < nbytes; b++) raw |= (uint32_t)s.byte() << (8 * b);
                v[k] = sign_extend(raw, 8 * nbytes);
              }
              break;
          }
          for (int k = 0; k < 3 && i < fields.size(); k++) out[i++] = v[k];
          break;
        }
        case ENC_TAG8_4S16: {
          // v2: one selector byte (field 0 in the LOW bits), then a nibble
          // stream: 4-bit values = 1 nibble, 8-bit = 2, 16-bit = 4; a
          // trailing half-filled byte is discarded.
          int selector = s.byte();
          int nib_buf = 0, nib_cnt = 0;
          auto nibble = [&]() {
            if (nib_cnt == 0) {
              nib_buf = s.byte();
              nib_cnt = 2;
            }
            nib_cnt--;
            return (nib_buf >> (4 * nib_cnt)) & 0x0F;
          };
          int64_t v[4] = {0, 0, 0, 0};
          for (int k = 0; k < 4; k++) {
            switch ((selector >> (2 * k)) & 3) {
              case 0:
                v[k] = 0;
                break;
              case 1:
                v[k] = sign_extend(nibble(), 4);
                break;
              case 2: {
                uint32_t raw = (uint32_t)nibble() << 4;
                raw |= nibble();
                v[k] = sign_extend(raw, 8);
                break;
              }
              case 3: {
                uint32_t raw = 0;
                for (int n = 0; n < 4; n++) raw = (raw << 4) | nibble();
                v[k] = sign_extend(raw, 16);
                break;
              }
            }
          }
          for (int k = 0; k < 4 && i < fields.size(); k++) out[i++] = v[k];
          break;
        }
        default:
          log.error = "unsupported encoding " + std::to_string(enc) +
                      " for field " + fields[i].name;
          s.eof = true;
          return;
      }
    }
  }

  int64_t apply_predictor(int pred, size_t i, int64_t raw,
                          const std::vector<int64_t>& current) {
    switch (pred) {
      case PRED_0:
        return raw;
      case PRED_PREVIOUS:
        return raw + (have_prev ? prev[i] : 0);
      case PRED_STRAIGHT_LINE:
        if (have_prev2) return raw + 2 * prev[i] - prev2[i];
        return raw + (have_prev ? prev[i] : 0);
      case PRED_AVERAGE_2:
        if (have_prev2) return raw + (prev[i] + prev2[i]) / 2;
        return raw + (have_prev ? prev[i] : 0);
      case PRED_MINTHROTTLE:
        return raw + log.minthrottle;
      case PRED_MOTOR_0: {
        // motor[0] of the CURRENT frame (decoded earlier in field order)
        for (size_t k = 0; k < i; k++)
          if (log.ifields[k].name == "motor[0]") return raw + current[k];
        return raw;
      }
      case PRED_INCREMENT:
        return raw + 1 + (have_prev ? prev[i] : 0);
      case PRED_1500:
        return raw + 1500;
      case PRED_VBATREF:
        return raw + log.vbatref;
      default:
        return raw;  // unknown predictors pass the raw value through
    }
  }

  void emit_row(const std::vector<int64_t>& main) {
    log.rows.insert(log.rows.end(), main.begin(), main.end());
    log.rows.insert(log.rows.end(), slow.begin(), slow.end());
    log.num_frames++;
  }

  bool decode_main(bool pframe) {
    std::vector<int64_t> raw, vals(log.ifields.size(), 0);
    decode_raw(log.ifields, pframe, raw);
    if (s.eof) return false;
    for (size_t i = 0; i < log.ifields.size(); i++) {
      int pred = pframe ? log.ifields[i].ppredictor : log.ifields[i].ipredictor;
      vals[i] = apply_predictor(pred, i, raw[i], vals);
    }
    if (!pframe) {
      // I-frame resets the prediction history
      prev = vals;
      prev2 = vals;
      have_prev = true;
      have_prev2 = false;
    } else {
      prev2 = prev;
      prev = vals;
      have_prev2 = have_prev;
      have_prev = true;
    }
    emit_row(vals);
    return true;
  }

  bool decode_slow() {
    std::vector<int64_t> raw;
    decode_raw(log.sfields, false, raw);
    if (s.eof) return false;
    for (size_t i = 0; i < log.sfields.size(); i++)
      slow[i] = apply_predictor(log.sfields[i].ipredictor, i, raw[i], raw);
    return true;
  }

  bool skip_aux(const std::vector<FieldDef>& fields) {
    if (fields.empty()) return false;  // defs missing: cannot stay in sync
    std::vector<int64_t> raw;
    decode_raw(fields, false, raw);
    return !s.eof;
  }

  // 'E' event frame: type byte + typed payload; 255 = end of log.
  bool decode_event(bool* end_of_log) {
    int etype = s.byte();
    switch (etype) {
      case 0:  // sync beep: time uVB
        read_unsigned_vb(s);
        return true;
      case 13:  // inflight adjustment: fn byte + value
      {
        int fn = s.byte();
        if (fn > 127) {
          // float value: 4 bytes
          for (int i = 0; i < 4; i++) s.byte();
        } else {
          read_signed_vb(s);
        }
        return true;
      }
      case 15:  // logging resume: iteration uVB + time uVB
        read_unsigned_vb(s);
        read_unsigned_vb(s);
        return true;
      case 30:  // flight mode: flags uVB + last flags uVB
        read_unsigned_vb(s);
        read_unsigned_vb(s);
        return true;
      case 32:  // disarm: reason uVB
        read_unsigned_vb(s);
        return true;
      case 255: {  // log end marker, followed by "End of log\0"
        static const char kEnd[] = "End of log";
        for (size_t k = 0; k < sizeof(kEnd) - 1; k++) s.byte();
        s.byte();  // trailing \0
        *end_of_log = true;
        return true;
      }
      default:
        return false;  // unknown event: force resync
    }
  }

  // After a corrupt frame, scan forward for a plausible frame-start byte.
  void resync() {
    while (!s.eof) {
      int c = s.peek();
      if (c == 'I' || c == 'E' || c < 0) return;
      s.byte();
    }
  }

  void run() {
    bool end = false;
    while (!s.eof && !end) {
      int ftype = s.byte();
      if (s.eof) break;
      bool ok = true;
      switch (ftype) {
        case 'I':
          ok = decode_main(false);
          break;
        case 'P':
          ok = decode_main(true);
          break;
        case 'S':
          ok = decode_slow();
          break;
        case 'G':
          ok = skip_aux(log.gfields);
          break;
        case 'H':
          ok = skip_aux(log.hfields);
          break;
        case 'E':
          ok = decode_event(&end);
          break;
        default:
          ok = false;
      }
      if (!ok && !end) resync();
    }
  }
};

// ---------------------------------------------------------------------------
// Multi-log file handling + C ABI
// ---------------------------------------------------------------------------

const char kLogStart[] = "H Product:Blackbox flight data recorder";

std::vector<size_t> find_log_starts(const uint8_t* data, size_t size) {
  std::vector<size_t> starts;
  size_t n = sizeof(kLogStart) - 1;
  for (size_t i = 0; i + n <= size; i++) {
    if (memcmp(data + i, kLogStart, n) == 0) starts.push_back(i);
  }
  return starts;
}

struct Handle {
  std::vector<uint8_t> data;
  std::vector<size_t> starts;
  Log log;  // the decoded (selected) log
};

constexpr int kMaxHandles = 64;
std::unique_ptr<Handle> g_handles[kMaxHandles];

Handle* get(int h) {
  if (h < 0 || h >= kMaxHandles) return nullptr;
  return g_handles[h].get();
}

}  // namespace

extern "C" {

// Parse log `log_index` (0-based) of the file. Returns handle >= 0, or
// -1 open/read failure, -2 no blackbox log found, -3 bad log index,
// -4 out of handles.
int bbx_open(const char* path, int log_index) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  auto handle = std::make_unique<Handle>();
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  handle->data.resize(size > 0 ? (size_t)size : 0);
  if (size > 0 && fread(handle->data.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);

  handle->starts = find_log_starts(handle->data.data(), handle->data.size());
  if (handle->starts.empty()) return -2;
  if (log_index < 0 || (size_t)log_index >= handle->starts.size()) return -3;

  size_t begin = handle->starts[log_index];
  size_t end = (size_t)log_index + 1 < handle->starts.size()
                   ? handle->starts[log_index + 1]
                   : handle->data.size();
  Stream s{handle->data.data() + begin, end - begin};
  parse_headers(s, handle->log);
  if (handle->log.ifields.empty()) return -2;
  Decoder dec(s, handle->log);
  dec.run();

  for (int i = 0; i < kMaxHandles; i++) {
    if (!g_handles[i]) {
      g_handles[i] = std::move(handle);
      return i;
    }
  }
  return -4;
}

int bbx_num_logs(int h) {
  Handle* p = get(h);
  return p ? (int)p->starts.size() : -1;
}

// number of emitted columns = main fields + slow fields
int bbx_num_fields(int h) {
  Handle* p = get(h);
  return p ? (int)(p->log.ifields.size() + p->log.sfields.size()) : -1;
}

int bbx_field_name(int h, int idx, char* buf, int buflen) {
  Handle* p = get(h);
  if (!p || idx < 0) return -1;
  size_t n_main = p->log.ifields.size();
  const std::string* name = nullptr;
  if ((size_t)idx < n_main)
    name = &p->log.ifields[idx].name;
  else if ((size_t)idx < n_main + p->log.sfields.size())
    name = &p->log.sfields[idx - n_main].name;
  if (!name) return -1;
  snprintf(buf, buflen, "%s", name->c_str());
  return (int)name->size();
}

long long bbx_num_frames(int h) {
  Handle* p = get(h);
  return p ? p->log.num_frames : -1;
}

// Copy the decoded table (num_frames x num_fields, row-major int64).
// Returns rows copied, or -1.
long long bbx_read_frames(int h, long long* out, long long capacity_rows) {
  Handle* p = get(h);
  if (!p) return -1;
  size_t ncols = p->log.ifields.size() + p->log.sfields.size();
  long long rows = p->log.num_frames;
  if (rows > capacity_rows) rows = capacity_rows;
  memcpy(out, p->log.rows.data(), (size_t)rows * ncols * sizeof(int64_t));
  return rows;
}

// Look up a header value ("Firmware revision", "minthrottle", ...).
int bbx_header_value(int h, const char* key, char* buf, int buflen) {
  Handle* p = get(h);
  if (!p) return -1;
  auto it = p->log.headers.find(key);
  if (it == p->log.headers.end()) return -1;
  snprintf(buf, buflen, "%s", it->second.c_str());
  return (int)it->second.size();
}

// Last decode error ("" when clean).
int bbx_error(int h, char* buf, int buflen) {
  Handle* p = get(h);
  if (!p) return -1;
  snprintf(buf, buflen, "%s", p->log.error.c_str());
  return (int)p->log.error.size();
}

void bbx_close(int h) {
  if (h >= 0 && h < kMaxHandles) g_handles[h].reset();
}

}  // extern "C"
