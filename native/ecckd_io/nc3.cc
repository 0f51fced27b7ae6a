// netCDF3-classic parser/serializer.  Format reference: the NetCDF Classic
// Format Specification (CDF-1/CDF-2); see nc3.h for the role this plays in
// the framework.
#include "nc3.h"

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <cstdio>
#include <cstring>

namespace nc3 {

namespace {

constexpr uint32_t TAG_DIM = 0x0A;
constexpr uint32_t TAG_VAR = 0x0B;
constexpr uint32_t TAG_ATT = 0x0C;
constexpr uint32_t ABSENT = 0;

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

inline size_t pad4(size_t n) { return (n + 3) & ~size_t(3); }

// Decode one big-endian element at p to double.
double decode_elem(const uint8_t* p, int32_t type) {
  switch (type) {
    case NC_BYTE:
      return static_cast<double>(*reinterpret_cast<const int8_t*>(p));
    case NC_CHAR:
      return static_cast<double>(*p);
    case NC_SHORT: {
      uint16_t v;
      std::memcpy(&v, p, 2);
      v = bswap16(v);
      int16_t s;
      std::memcpy(&s, &v, 2);
      return s;
    }
    case NC_INT: {
      uint32_t v;
      std::memcpy(&v, p, 4);
      v = bswap32(v);
      int32_t s;
      std::memcpy(&s, &v, 4);
      return s;
    }
    case NC_FLOAT: {
      uint32_t v;
      std::memcpy(&v, p, 4);
      v = bswap32(v);
      float f;
      std::memcpy(&f, &v, 4);
      return f;
    }
    case NC_DOUBLE: {
      uint64_t v;
      std::memcpy(&v, p, 8);
      v = bswap64(v);
      double d;
      std::memcpy(&d, &v, 8);
      return d;
    }
    default:
      return 0.0;
  }
}

void encode_elem(double x, int32_t type, uint8_t* p) {
  switch (type) {
    case NC_BYTE:
    case NC_CHAR: {
      *p = static_cast<uint8_t>(static_cast<int64_t>(x));
      return;
    }
    case NC_SHORT: {
      int16_t s = static_cast<int16_t>(x);
      uint16_t v;
      std::memcpy(&v, &s, 2);
      v = bswap16(v);
      std::memcpy(p, &v, 2);
      return;
    }
    case NC_INT: {
      int32_t s = static_cast<int32_t>(x);
      uint32_t v;
      std::memcpy(&v, &s, 4);
      v = bswap32(v);
      std::memcpy(p, &v, 4);
      return;
    }
    case NC_FLOAT: {
      float f = static_cast<float>(x);
      uint32_t v;
      std::memcpy(&v, &f, 4);
      v = bswap32(v);
      std::memcpy(p, &v, 4);
      return;
    }
    case NC_DOUBLE: {
      uint64_t v;
      std::memcpy(&v, &x, 8);
      v = bswap64(v);
      std::memcpy(p, &v, 8);
      return;
    }
  }
}

void append_u32(std::vector<uint8_t>* out, uint32_t v) {
  v = bswap32(v);
  const uint8_t* p = reinterpret_cast<const uint8_t*>(&v);
  out->insert(out->end(), p, p + 4);
}

void append_name(std::vector<uint8_t>* out, const std::string& s) {
  append_u32(out, static_cast<uint32_t>(s.size()));
  out->insert(out->end(), s.begin(), s.end());
  for (size_t i = s.size(); i < pad4(s.size()); ++i) out->push_back(0);
}

void append_atts(std::vector<uint8_t>* out, const std::vector<Att>& atts) {
  if (atts.empty()) {
    append_u32(out, ABSENT);
    append_u32(out, 0);
    return;
  }
  append_u32(out, TAG_ATT);
  append_u32(out, static_cast<uint32_t>(atts.size()));
  for (const Att& a : atts) {
    append_name(out, a.name);
    append_u32(out, static_cast<uint32_t>(a.type));
    if (a.type == NC_CHAR) {
      append_u32(out, static_cast<uint32_t>(a.text.size()));
      out->insert(out->end(), a.text.begin(), a.text.end());
      for (size_t i = a.text.size(); i < pad4(a.text.size()); ++i)
        out->push_back(0);
    } else {
      append_u32(out, static_cast<uint32_t>(a.values.size()));
      size_t es = type_size(a.type);
      size_t start = out->size();
      out->resize(start + pad4(a.values.size() * es), 0);
      for (size_t i = 0; i < a.values.size(); ++i)
        encode_elem(a.values[i], a.type, out->data() + start + i * es);
    }
  }
}

}  // namespace

size_t type_size(int32_t t) {
  switch (t) {
    case NC_BYTE:
    case NC_CHAR:
      return 1;
    case NC_SHORT:
      return 2;
    case NC_INT:
    case NC_FLOAT:
      return 4;
    case NC_DOUBLE:
      return 8;
    default:
      return 0;
  }
}

Reader::~Reader() {
  if (fd_ >= 0) close(fd_);
}

bool Reader::need(size_t n, std::string* err) {
  if (pos_ + n > header_.size()) {
    *err = "truncated netCDF header";
    return false;
  }
  return true;
}

uint32_t Reader::u32() {
  uint32_t v;
  std::memcpy(&v, header_.data() + pos_, 4);
  pos_ += 4;
  return bswap32(v);
}

int64_t Reader::offset() {
  if (version_ == 1) return static_cast<int64_t>(u32());
  uint64_t v;
  std::memcpy(&v, header_.data() + pos_, 8);
  pos_ += 8;
  return static_cast<int64_t>(bswap64(v));
}

bool Reader::read_u32(uint32_t* v, std::string* err) {
  if (!need(4, err)) return false;
  *v = u32();
  return true;
}

bool Reader::read_offset(int64_t* v, std::string* err) {
  if (!need(version_ == 1 ? 4 : 8, err)) return false;
  *v = offset();
  return true;
}

bool Reader::read_name(std::string* s, std::string* err) {
  uint32_t n;
  if (!read_u32(&n, err)) return false;
  // need(n) first: pad4(n) can wrap for a garbage length near
  // UINT32_MAX, but any n beyond the header already fails here (and a
  // chunk-straddling name keys Open()'s grow-retry via the sentinel).
  if (!need(n, err) || !need(pad4(n), err)) return false;
  s->assign(reinterpret_cast<const char*>(header_.data() + pos_), n);
  pos_ += pad4(n);
  return true;
}

bool Reader::parse_atts(std::vector<Att>* out, std::string* err) {
  if (!need(8, err)) return false;
  uint32_t tag = u32();
  uint32_t count = u32();
  if (tag == ABSENT) return true;
  if (tag != TAG_ATT) {
    *err = "bad attribute-list tag";
    return false;
  }
  for (uint32_t i = 0; i < count; ++i) {
    Att a;
    uint32_t atype, n;
    if (!read_name(&a.name, err) || !read_u32(&atype, err) ||
        !read_u32(&n, err))
      return false;
    a.type = static_cast<int32_t>(atype);
    size_t es = type_size(a.type);
    if (es == 0) {
      *err = "bad attribute payload";
      return false;
    }
    // need() keeps its "truncated netCDF header" sentinel here: a
    // payload straddling the read chunk must key Open()'s grow-retry,
    // not surface as a corrupt-file error.
    if (!need(pad4(n * es), err)) return false;
    if (a.type == NC_CHAR) {
      a.text.assign(reinterpret_cast<const char*>(header_.data() + pos_), n);
    } else {
      a.values.resize(n);
      for (uint32_t k = 0; k < n; ++k)
        a.values[k] = decode_elem(header_.data() + pos_ + k * es, a.type);
    }
    pos_ += pad4(n * es);
    out->push_back(std::move(a));
  }
  return true;
}

Reader* Reader::Open(const std::string& path, std::string* err) {
  Reader* r = new Reader();
  r->fd_ = open(path.c_str(), O_RDONLY);
  if (r->fd_ < 0) {
    *err = "cannot open " + path;
    delete r;
    return nullptr;
  }
  struct stat st;
  fstat(r->fd_, &st);
  r->file_size_ = st.st_size;
  // The header is everything before the first variable's data; read a
  // chunk and retry with a larger one if parsing runs past it.
  for (int64_t chunk = std::min<int64_t>(r->file_size_, 1 << 20);;
       chunk = std::min<int64_t>(r->file_size_, chunk * 4)) {
    r->header_.resize(chunk);
    if (pread(r->fd_, r->header_.data(), chunk, 0) != (ssize_t)chunk) {
      *err = "short read";
      delete r;
      return nullptr;
    }
    r->pos_ = 0;
    r->dims_.clear();
    r->gatts_.clear();
    r->vars_.clear();
    if (r->Parse(err)) return r;
    if (*err != "truncated netCDF header" || chunk >= r->file_size_) {
      delete r;
      return nullptr;
    }
  }
}

bool Reader::Parse(std::string* err) {
  if (header_.size() < 8 || header_[0] != 'C' || header_[1] != 'D' ||
      header_[2] != 'F') {
    *err = "not a netCDF3 classic file";
    return false;
  }
  version_ = header_[3];
  if (version_ != 1 && version_ != 2) {
    *err = "unsupported netCDF version (HDF5/netCDF4?)";
    return false;
  }
  pos_ = 4;
  numrecs_ = static_cast<int64_t>(u32());  // 0xFFFFFFFF = STREAMING
  // dim_list
  if (!need(8, err)) return false;
  uint32_t tag = u32(), count = u32();
  if (tag == TAG_DIM) {
    for (uint32_t i = 0; i < count; ++i) {
      Dim d;
      uint32_t sz;
      if (!read_name(&d.name, err) || !read_u32(&sz, err)) return false;
      d.size = static_cast<int64_t>(sz);
      d.is_record = (d.size == 0);
      dims_.push_back(std::move(d));
    }
  } else if (tag != ABSENT) {
    *err = "bad dimension-list tag";
    return false;
  }
  if (!parse_atts(&gatts_, err)) return false;
  // var_list
  if (!need(8, err)) return false;
  tag = u32();
  count = u32();
  if (tag == TAG_VAR) {
    for (uint32_t i = 0; i < count; ++i) {
      Var v;
      uint32_t nd;
      if (!read_name(&v.name, err) || !read_u32(&nd, err)) return false;
      v.is_record = false;
      v.num_elems_per_record = 1;
      for (uint32_t k = 0; k < nd; ++k) {
        uint32_t raw;
        if (!read_u32(&raw, err)) return false;
        int32_t id = static_cast<int32_t>(raw);
        if (id < 0 || static_cast<size_t>(id) >= dims_.size()) {
          *err = "bad dimension id in variable " + v.name;
          return false;
        }
        v.dimids.push_back(id);
        if (dims_[id].is_record)
          v.is_record = true;
        else
          v.num_elems_per_record *= dims_[id].size;
      }
      if (!parse_atts(&v.atts, err)) return false;
      uint32_t vtype, vsize;
      if (!read_u32(&vtype, err) || !read_u32(&vsize, err) ||
          !read_offset(&v.begin, err))
        return false;
      v.type = static_cast<int32_t>(vtype);
      v.vsize = static_cast<int64_t>(vsize);
      vars_.push_back(std::move(v));
    }
  } else if (tag != ABSENT) {
    *err = "bad variable-list tag";
    return false;
  }
  recsize_ = 0;
  int n_rec_vars = 0;
  for (const Var& v : vars_)
    if (v.is_record) {
      recsize_ += v.vsize;
      ++n_rec_vars;
    }
  // Special case from the spec: a single record variable is laid out
  // without per-record padding.
  if (n_rec_vars == 1)
    for (const Var& v : vars_)
      if (v.is_record)
        recsize_ = v.num_elems_per_record * (int64_t)type_size(v.type);
  // STREAMING convention: numrecs = 0xFFFFFFFF means "derive from the
  // file size" (CDF spec) — without this, var_shape() would report
  // ~4.3e9 records and a reader would try to allocate/stream them.
  if (numrecs_ == 0xFFFFFFFFll) {
    if (n_rec_vars == 0 || recsize_ <= 0) {
      numrecs_ = 0;
    } else {
      int64_t first = -1;
      for (const Var& v : vars_)
        if (v.is_record && (first < 0 || v.begin < first)) first = v.begin;
      numrecs_ = first < 0 ? 0
                           : std::max<int64_t>(0, (file_size_ - first) /
                                                      recsize_);
    }
  }
  return true;
}

int Reader::var_id(const std::string& n) const {
  for (size_t i = 0; i < vars_.size(); ++i)
    if (vars_[i].name == n) return static_cast<int>(i);
  return -1;
}

std::vector<int64_t> Reader::var_shape(int vid) const {
  std::vector<int64_t> s;
  for (int32_t id : vars_[vid].dimids)
    s.push_back(dims_[id].is_record ? numrecs_ : dims_[id].size);
  return s;
}

int64_t Reader::var_elems(int vid) const {
  int64_t n = 1;
  for (int64_t d : var_shape(vid)) n *= d;
  return n;
}

bool Reader::read_var_double(int vid, double* out, std::string* err) const {
  const Var& v = vars_[vid];
  size_t es = type_size(v.type);
  if (es == 0) {
    // An unknown type code must be a loud error: type_size(unknown)==0
    // would make the pread below a 0-byte "success" and decode_elem
    // would silently return zeros for every element.
    *err = "unknown type for variable " + v.name;
    return false;
  }
  int64_t per_rec = v.num_elems_per_record;
  int64_t nrec = v.is_record ? numrecs_ : 1;
  // Per-record payloads are read in bounded slabs: a single pread
  // transfers at most 0x7ffff000 bytes on Linux, so a >=2 GiB CDF-2
  // variable would otherwise fail with a short read on a valid file.
  constexpr int64_t kSlab = 256ll << 20;
  std::vector<uint8_t> buf(
      static_cast<size_t>(std::min<int64_t>(per_rec * (int64_t)es, kSlab)));
  for (int64_t r = 0; r < nrec; ++r) {
    int64_t rec_off = v.begin + (v.is_record ? r * recsize_ : 0);
    double* dst = out + r * per_rec;
    int64_t done = 0;                       // elements decoded so far
    while (done < per_rec) {
      int64_t elems = std::min<int64_t>(per_rec - done,
                                        kSlab / (int64_t)es);
      int64_t bytes = elems * (int64_t)es;
      ssize_t got = pread(fd_, buf.data(), bytes,
                          rec_off + done * (int64_t)es);
      if (got != (ssize_t)bytes) {
        *err = "short data read for " + v.name;
        return false;
      }
      for (int64_t i = 0; i < elems; ++i)
        dst[done + i] = decode_elem(buf.data() + i * es, v.type);
      done += elems;
    }
  }
  return true;
}

// ---------------------------------------------------------------------------

int Writer::def_dim(const std::string& n, int64_t size) {
  dims_.push_back(Dim{n, size, size == 0});
  return static_cast<int>(dims_.size()) - 1;
}

int Writer::def_var(const std::string& n, int32_t type,
                    const std::vector<int32_t>& dimids) {
  Var v;
  v.name = n;
  v.type = type;
  v.dimids = dimids;
  v.is_record = false;
  v.num_elems_per_record = 1;
  for (int32_t id : dimids) {
    if (dims_[id].is_record)
      v.is_record = true;
    else
      v.num_elems_per_record *= dims_[id].size;
  }
  vars_.push_back(std::move(v));
  data_.emplace_back();
  return static_cast<int>(vars_.size()) - 1;
}

void Writer::put_att_text(int vid, const std::string& n,
                          const std::string& value) {
  Att a;
  a.name = n;
  a.type = NC_CHAR;
  a.text = value;
  (vid < 0 ? gatts_ : vars_[vid].atts).push_back(std::move(a));
}

void Writer::put_att_double(int vid, const std::string& n,
                            const std::vector<double>& vals, int32_t type) {
  Att a;
  a.name = n;
  a.type = type;
  a.values = vals;
  (vid < 0 ? gatts_ : vars_[vid].atts).push_back(std::move(a));
}

bool Writer::put_var_double(int vid, const double* data, int64_t n,
                            std::string* err) {
  const Var& v = vars_[vid];
  if (v.is_record) {
    *err = "record variables not supported by the writer";
    return false;
  }
  if (n != v.num_elems_per_record) {
    *err = "size mismatch for " + v.name;
    return false;
  }
  size_t es = type_size(v.type);
  std::vector<uint8_t>& buf = data_[vid];
  buf.resize(pad4(n * es), 0);
  for (int64_t i = 0; i < n; ++i)
    encode_elem(data[i], v.type, buf.data() + i * es);
  return true;
}

bool Writer::finish(std::string* err) {
  // Every defined variable must have been written: begins[] advances by
  // data_[i].size(), so an unfilled variable would silently alias the
  // NEXT variable's bytes (its header vsize still claims the full
  // padded size) — a corrupt file with no error anywhere.
  for (size_t i = 0; i < vars_.size(); ++i) {
    int64_t want = pad4(vars_[i].num_elems_per_record *
                        (int64_t)type_size(vars_[i].type));
    if ((int64_t)data_[i].size() != want) {
      *err = "variable " + vars_[i].name + " defined but never written";
      return false;
    }
  }
  std::vector<uint8_t> hdr;
  hdr.insert(hdr.end(), {'C', 'D', 'F', 2});  // CDF-2: 64-bit offsets
  append_u32(&hdr, 0);                        // numrecs
  if (dims_.empty()) {
    append_u32(&hdr, ABSENT);
    append_u32(&hdr, 0);
  } else {
    append_u32(&hdr, TAG_DIM);
    append_u32(&hdr, static_cast<uint32_t>(dims_.size()));
    for (const Dim& d : dims_) {
      append_name(&hdr, d.name);
      append_u32(&hdr, static_cast<uint32_t>(d.is_record ? 0 : d.size));
    }
  }
  append_atts(&hdr, gatts_);
  // Variable list: two passes — sizes depend on header length, so lay out
  // with placeholder offsets first.
  auto emit_vars = [&](std::vector<uint8_t>* out,
                       const std::vector<int64_t>& begins) {
    if (vars_.empty()) {
      append_u32(out, ABSENT);
      append_u32(out, 0);
      return;
    }
    append_u32(out, TAG_VAR);
    append_u32(out, static_cast<uint32_t>(vars_.size()));
    for (size_t i = 0; i < vars_.size(); ++i) {
      const Var& v = vars_[i];
      append_name(out, v.name);
      append_u32(out, static_cast<uint32_t>(v.dimids.size()));
      for (int32_t id : v.dimids) append_u32(out, static_cast<uint32_t>(id));
      append_atts(out, v.atts);
      append_u32(out, static_cast<uint32_t>(v.type));
      int64_t vsize = pad4(v.num_elems_per_record * type_size(v.type));
      append_u32(out, static_cast<uint32_t>(
          std::min<int64_t>(vsize, 0xFFFFFFFFll)));
      uint64_t b = bswap64(static_cast<uint64_t>(begins[i]));
      const uint8_t* p = reinterpret_cast<const uint8_t*>(&b);
      out->insert(out->end(), p, p + 8);
    }
  };
  std::vector<int64_t> begins(vars_.size(), 0);
  std::vector<uint8_t> tmp = hdr;
  emit_vars(&tmp, begins);
  int64_t off = static_cast<int64_t>(tmp.size());
  for (size_t i = 0; i < vars_.size(); ++i) {
    begins[i] = off;
    off += static_cast<int64_t>(data_[i].size());
  }
  emit_vars(&hdr, begins);

  FILE* f = fopen(path_.c_str(), "wb");
  if (!f) {
    *err = "cannot create " + path_;
    return false;
  }
  bool ok = fwrite(hdr.data(), 1, hdr.size(), f) == hdr.size();
  for (size_t i = 0; ok && i < data_.size(); ++i)
    ok = fwrite(data_[i].data(), 1, data_[i].size(), f) == data_[i].size();
  fclose(f);
  if (!ok) *err = "write failed for " + path_;
  return ok;
}

bool UpdateVarDouble(const std::string& path, const std::string& name,
                     const double* data, int64_t n, std::string* err) {
  Reader* r = Reader::Open(path, err);
  if (!r) return false;
  int vid = r->var_id(name);
  if (vid < 0) {
    *err = "no variable " + name + " in " + path;
    delete r;
    return false;
  }
  const Var& v = r->vars()[vid];
  if (v.is_record || r->var_elems(vid) != n) {
    *err = "shape mismatch updating " + name;
    delete r;
    return false;
  }
  size_t es = type_size(v.type);
  std::vector<uint8_t> buf(n * es);
  for (int64_t i = 0; i < n; ++i)
    encode_elem(data[i], v.type, buf.data() + i * es);
  int64_t begin = v.begin;
  delete r;
  int fd = open(path.c_str(), O_WRONLY);
  if (fd < 0) {
    *err = "cannot open " + path + " for update";
    return false;
  }
  bool ok = pwrite(fd, buf.data(), buf.size(), begin) == (ssize_t)buf.size();
  close(fd);
  if (!ok) *err = "update write failed";
  return ok;
}

}  // namespace nc3
