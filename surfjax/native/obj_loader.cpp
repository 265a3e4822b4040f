// Native OBJ mesh loader (the framework's data-loader runtime piece).
//
// Parses `v x y z` and `f i j k ...` records (fan-triangulating polygon
// faces, handling `i/j/k` vertex/uv/normal syntax and OBJ negative
// indices) at memory speed — the Python fallback in config.py walks the
// file line-by-line in the interpreter, which is seconds-per-million-
// triangles. Exposed via ctypes (surfjax/native/__init__.py::load_obj):
//   obj_count(path, &nv, &ntri)        — sizing pass
//   obj_load(path, verts, faces, nv, ntri) — fill pass
// Build: g++ -O2 -shared -fPIC obj_loader.cpp -o libobjloader.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Cursor {
    const char* p;
    const char* end;
};

inline void skip_ws(Cursor& c) {
    while (c.p < c.end && (*c.p == ' ' || *c.p == '\t')) ++c.p;
}

// line terminators: \n, \r\n and classic-Mac bare \r all end a record
inline void skip_line(Cursor& c) {
    while (c.p < c.end && *c.p != '\n' && *c.p != '\r') ++c.p;
    if (c.p < c.end && *c.p == '\r') ++c.p;
    if (c.p < c.end && *c.p == '\n') ++c.p;
}

inline bool is_eol(char ch) { return ch == '\n' || ch == '\r'; }

inline bool parse_float(Cursor& c, float* out) {
    skip_ws(c);
    char* q = nullptr;
    float v = strtof(c.p, &q);
    if (q == c.p) return false;
    c.p = q;
    *out = v;
    return true;
}

// first integer of an OBJ face vertex spec "i", "i/j", "i//k", "i/j/k"
inline bool parse_face_index(Cursor& c, long* out) {
    skip_ws(c);
    char* q = nullptr;
    long v = strtol(c.p, &q, 10);
    if (q == c.p) return false;
    c.p = q;
    while (c.p < c.end && *c.p != ' ' && *c.p != '\t'
           && !is_eol(*c.p))
        ++c.p;  // skip /uv/normal part
    *out = v;
    return true;
}

std::vector<char> read_file(const char* path) {
    std::vector<char> buf;
    FILE* fh = fopen(path, "rb");
    if (!fh) return buf;
    if (fseek(fh, 0, SEEK_END) != 0) { fclose(fh); return buf; }
    long n = ftell(fh);
    if (n <= 0 || fseek(fh, 0, SEEK_SET) != 0) { fclose(fh); return buf; }
    buf.resize(static_cast<size_t>(n));
    if (n > 0 && fread(buf.data(), 1, static_cast<size_t>(n), fh)
        != static_cast<size_t>(n))
        buf.clear();
    fclose(fh);
    // NUL-terminate so strtof/strtol can never scan past the buffer
    if (!buf.empty()) buf.push_back('\0');
    return buf;
}

}  // namespace

extern "C" {

// -> 0 on success. Counts vertices and fan-triangulated triangles.
int obj_count(const char* path, int64_t* nv, int64_t* ntri) {
    std::vector<char> buf = read_file(path);
    if (buf.empty()) return 1;
    Cursor c{buf.data(), buf.data() + buf.size() - 1};
    int64_t v = 0, t = 0;
    while (c.p < c.end) {
        skip_ws(c);  // exporters sometimes indent records
        if (c.p < c.end && c.p[0] == 'v' && c.p + 1 < c.end
            && (c.p[1] == ' ' || c.p[1] == '\t')) {
            // same three-float parse check as obj_load so a malformed
            // vertex line (e.g. "v 1 2") is skipped by BOTH passes and
            // the counts stay in agreement
            Cursor l{c.p + 1, c.end};
            float x, y, z;
            if (parse_float(l, &x) && parse_float(l, &y)
                && parse_float(l, &z))
                ++v;
        } else if (c.p < c.end && c.p[0] == 'f' && c.p + 1 < c.end
                   && (c.p[1] == ' ' || c.p[1] == '\t')) {
            Cursor f{c.p + 1, c.end};
            long idx;
            int64_t k = 0;
            while (f.p < f.end && !is_eol(*f.p)
                   && parse_face_index(f, &idx))
                ++k;
            if (k >= 3) t += k - 2;
        }
        skip_line(c);
    }
    *nv = v;
    *ntri = t;
    return 0;
}

// verts: (nv*3) f32, faces: (ntri*3) i32 — sized by obj_count.
// -> 0 on success, 2 on count mismatch / bad index.
int obj_load(const char* path, float* verts, int32_t* faces,
             int64_t nv, int64_t ntri) {
    std::vector<char> buf = read_file(path);
    if (buf.empty()) return 1;
    Cursor c{buf.data(), buf.data() + buf.size() - 1};
    int64_t v = 0, t = 0;
    std::vector<long> poly;
    while (c.p < c.end) {
        skip_ws(c);
        if (c.p < c.end && c.p[0] == 'v' && c.p + 1 < c.end
            && (c.p[1] == ' ' || c.p[1] == '\t')) {
            Cursor l{c.p + 1, c.end};
            float x, y, z;
            if (parse_float(l, &x) && parse_float(l, &y)
                && parse_float(l, &z)) {
                if (v >= nv) return 2;
                verts[v * 3 + 0] = x;
                verts[v * 3 + 1] = y;
                verts[v * 3 + 2] = z;
                ++v;
            }
        } else if (c.p < c.end && c.p[0] == 'f' && c.p + 1 < c.end
                   && (c.p[1] == ' ' || c.p[1] == '\t')) {
            Cursor l{c.p + 1, c.end};
            poly.clear();
            long idx;
            while (l.p < l.end && !is_eol(*l.p)
                   && parse_face_index(l, &idx))
                // OBJ: 1-based; negative = relative to current vertex count
                poly.push_back(idx > 0 ? idx - 1 : v + idx);
            for (size_t k = 1; k + 1 < poly.size(); ++k) {
                if (t >= ntri) return 2;
                long a = poly[0], b = poly[k], d = poly[k + 1];
                if (a < 0 || b < 0 || d < 0
                    || a >= nv || b >= nv || d >= nv) return 2;
                faces[t * 3 + 0] = static_cast<int32_t>(a);
                faces[t * 3 + 1] = static_cast<int32_t>(b);
                faces[t * 3 + 2] = static_cast<int32_t>(d);
                ++t;
            }
        }
        skip_line(c);
    }
    return (v == nv && t == ntri) ? 0 : 2;
}

}  // extern "C"
