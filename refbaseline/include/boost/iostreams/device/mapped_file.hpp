// boost::iostreams::mapped_file_source stand-in: slurps the file into a
// heap buffer (the reference only ever reads sequentially through
// begin()/end(), so true memory-mapping is a performance detail).
#pragma once
#include <fstream>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost { namespace iostreams {

class mapped_file_source {
    std::shared_ptr<std::vector<char>> buf_;

public:
    typedef const char* iterator;

    mapped_file_source() = default;
    explicit mapped_file_source(const std::string& path) { open(path); }

    void open(const std::string& path)
    {
        std::ifstream in(path, std::ios::binary);
        if (!in) throw std::runtime_error("mapped_file_source: cannot open " + path);
        buf_ = std::make_shared<std::vector<char>>(
            (std::istreambuf_iterator<char>(in)), std::istreambuf_iterator<char>());
    }

    bool is_open() const { return (bool)buf_; }
    void close() { buf_.reset(); }
    const char* data() const { return buf_ && !buf_->empty() ? buf_->data() : nullptr; }
    std::size_t size() const { return buf_ ? buf_->size() : 0; }
    iterator begin() const { return data(); }
    iterator end() const { return data() + size(); }
};

}}  // namespace boost::iostreams
