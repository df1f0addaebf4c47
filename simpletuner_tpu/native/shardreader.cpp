// WebDataset tar-shard indexer + range reader.
//
// TPU-native replacement for the reference's Rust `webshart` wheel
// (reference: setup.py:343; helpers/data_backend/webshart.py:59 — shard
// discovery + member reads for billion-sample datasets; SURVEY.md §2.9).
// A tar index is just a hop over 512-byte headers — no decompression, no
// payload reads — so indexing a multi-GB shard costs milliseconds of seeks.
//
// Build: g++ -O3 -shared -fPIC shardreader.cpp -o libshardreader.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

// octal or base-256 encoded tar numeric field
int64_t tar_number(const char* field, int len) {
    if (static_cast<unsigned char>(field[0]) & 0x80) {  // base-256 (GNU large files)
        int64_t value = static_cast<unsigned char>(field[0]) & 0x7f;
        for (int i = 1; i < len; ++i)
            value = (value << 8) | static_cast<unsigned char>(field[i]);
        return value;
    }
    int64_t value = 0;
    for (int i = 0; i < len && field[i]; ++i) {
        if (field[i] >= '0' && field[i] <= '7') value = value * 8 + (field[i] - '0');
    }
    return value;
}

}  // namespace

extern "C" {

// Index a tar file.  Writes "name\toffset\tsize\n" lines for every regular
// file member into out_buf.  Returns bytes written, or -(bytes needed) when
// out_cap is too small, or -1 on IO error.
int64_t st_tar_index(const char* tar_path, char* out_buf, int64_t out_cap) {
    FILE* f = std::fopen(tar_path, "rb");
    if (!f) return -1;
    std::string out;
    out.reserve(1 << 20);
    char header[512];
    int64_t offset = 0;
    std::string pending_longname;
    while (std::fread(header, 1, 512, f) == 512) {
        offset += 512;
        if (header[0] == '\0') break;  // end-of-archive zero block
        int64_t size = tar_number(header + 124, 12);
        char type = header[156];
        std::string name;
        if (!pending_longname.empty()) {
            name = pending_longname;
            pending_longname.clear();
        } else {
            char prefix[156] = {0};
            std::memcpy(prefix, header + 345, 155);
            char shortname[101] = {0};
            std::memcpy(shortname, header, 100);
            name = prefix[0] ? std::string(prefix) + "/" + shortname : std::string(shortname);
        }
        const int64_t padded = (size + 511) & ~511LL;
        if (type == 'L') {  // GNU longname: payload holds the real name
            std::string buf(size, '\0');
            if (std::fread(&buf[0], 1, size, f) != static_cast<size_t>(size)) break;
            if (std::fseek(f, padded - size, SEEK_CUR)) break;
            pending_longname = buf.c_str();  // trim at NUL
            offset += padded;
            continue;
        }
        if (type == '0' || type == '\0') {  // regular file
            out += name;
            out += '\t';
            out += std::to_string(offset);
            out += '\t';
            out += std::to_string(size);
            out += '\n';
        }
        if (std::fseek(f, padded, SEEK_CUR)) break;
        offset += padded;
    }
    std::fclose(f);
    if (static_cast<int64_t>(out.size()) > out_cap) return -static_cast<int64_t>(out.size());
    std::memcpy(out_buf, out.data(), out.size());
    return static_cast<int64_t>(out.size());
}

// Read `size` bytes at `offset` from the file into dst.  Returns bytes read.
int64_t st_pread(const char* path, int64_t offset, int64_t size, uint8_t* dst) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    if (std::fseek(f, static_cast<long>(offset), SEEK_SET)) {
        std::fclose(f);
        return -1;
    }
    const int64_t got = static_cast<int64_t>(std::fread(dst, 1, size, f));
    std::fclose(f);
    return got;
}

int st_shard_abi_version() { return 1; }

}  // extern "C"
